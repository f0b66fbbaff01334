// letor_parser — native LETOR/LibSVM text parser for the data loader.
//
// The reference parses LETOR text in Python line-by-line
// (ptranking/data/data_utils.py:276-387, iter_lines/parse_letor), which is
// the slow path for MSLR-WEB30K-scale corpora (millions of rows). This C++
// parser keeps the exact semantics — auto-growing feature width, 0/1-indexed
// feature ids, '#'-comments carrying "docid = X" docids, targetless rows —
// behind a small C ABI consumed via ctypes (ptranking_tpu/data/native_parser
// .py), with the Python parser as the always-available fallback.
//
// Contract (mirrors parse_letor_lines in ptranking_tpu/data/letor.py):
//   * row = [label] qid:<str> <fid>:<val>... [# comment]
//   * one_indexed: fid - 1; feature width = max fid + 1 over the file
//   * missing features default to 0.0f
//   * docid = third whitespace token of the comment when it has >= 3 tokens
//     ("docid = GX..." -> "GX..."), else the first token, else "".

#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

namespace {

struct Parsed {
  int64_t rows = 0;
  int32_t num_features = 0;
  std::vector<int64_t> row_offsets;   // into fids/vals, rows + 1
  std::vector<int32_t> fids;
  std::vector<float> vals;
  std::vector<float> labels;
  std::string qids;    // NUL-separated, one per row
  std::string docids;  // NUL-separated, one per row (empty when no comments)
  bool has_docids = false;
};

const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
  return p;
}

}  // namespace

extern "C" {

// Parse `path`; returns an opaque handle (nullptr on error).
void* letor_parse(const char* path, int one_indexed, int has_targets) {
  std::ifstream in(path, std::ios::binary);
  if (!in) return nullptr;

  auto* out = new Parsed();
  out->row_offsets.push_back(0);

  std::string line;
  while (std::getline(in, line)) {
    const char* p = line.c_str();
    const char* end = p + line.size();
    p = skip_ws(p, end);
    if (p >= end || *p == '#') continue;

    float label = -1.0f;
    if (has_targets) {
      char* next = nullptr;
      label = std::strtof(p, &next);
      if (next == p) { delete out; return nullptr; }
      p = skip_ws(next, end);
    }

    // qid:<str>
    if (end - p < 4 || std::strncmp(p, "qid:", 4) != 0) { delete out; return nullptr; }
    p += 4;
    const char* q0 = p;
    while (p < end && !std::isspace(static_cast<unsigned char>(*p))) p++;
    out->qids.append(q0, p - q0);
    out->qids.push_back('\0');

    // fid:val pairs until '#' or end of line
    std::string docid;
    while (true) {
      p = skip_ws(p, end);
      if (p >= end) break;
      if (*p == '#') {
        // comment: docid = 3rd token if "docid = X", else 1st token
        p++;
        std::vector<std::string> toks;
        while (p < end && toks.size() < 3) {
          p = skip_ws(p, end);
          const char* t0 = p;
          while (p < end && !std::isspace(static_cast<unsigned char>(*p))) p++;
          if (p > t0) toks.emplace_back(t0, p - t0);
        }
        if (toks.size() >= 3) docid = toks[2];
        else if (!toks.empty()) docid = toks[0];
        out->has_docids = true;
        break;
      }
      char* next = nullptr;
      long fid = std::strtol(p, &next, 10);
      if (next == p || *next != ':') { delete out; return nullptr; }
      fid -= one_indexed ? 1 : 0;
      if (fid < 0) { delete out; return nullptr; }
      p = next + 1;
      float val = std::strtof(p, &next);
      if (next == p) { delete out; return nullptr; }
      p = next;
      out->fids.push_back(static_cast<int32_t>(fid));
      out->vals.push_back(val);
      if (fid + 1 > out->num_features)
        out->num_features = static_cast<int32_t>(fid + 1);
    }

    out->docids += docid;
    out->docids.push_back('\0');
    out->labels.push_back(label);
    out->row_offsets.push_back(static_cast<int64_t>(out->fids.size()));
    out->rows++;
  }
  return out;
}

void letor_dims(void* handle, int64_t* rows, int32_t* num_features,
                int64_t* qid_bytes, int64_t* docid_bytes, int32_t* has_docids) {
  auto* d = static_cast<Parsed*>(handle);
  *rows = d->rows;
  *num_features = d->num_features;
  *qid_bytes = static_cast<int64_t>(d->qids.size());
  *docid_bytes = static_cast<int64_t>(d->docids.size());
  *has_docids = d->has_docids ? 1 : 0;
}

// Densify into caller-allocated buffers: features [rows * num_features]
// (zero-initialised by the caller), labels [rows], qids/docids byte buffers.
void letor_fill(void* handle, float* features, float* labels,
                char* qids, char* docids) {
  auto* d = static_cast<Parsed*>(handle);
  const int64_t F = d->num_features;
  for (int64_t r = 0; r < d->rows; r++) {
    labels[r] = d->labels[r];
    for (int64_t i = d->row_offsets[r]; i < d->row_offsets[r + 1]; i++)
      features[r * F + d->fids[i]] = d->vals[i];
  }
  std::memcpy(qids, d->qids.data(), d->qids.size());
  std::memcpy(docids, d->docids.data(), d->docids.size());
}

void letor_close(void* handle) { delete static_cast<Parsed*>(handle); }

}  // extern "C"
