// ndeval — TREC novelty/diversity evaluator, C++ re-implementation.
//
// A from-scratch C++17 equivalent of the TREC `ndeval` tool shipped with the
// reference framework (reference: ptranking/metric/srd/ndeval.c, version 4.4),
// with the same CLI contract and the same measures:
//
//   ndeval [options] qrels run        -> CSV on stdout
//
//   measures: ERR-IA@{5,10,20}, nERR-IA@{5,10,20}, alpha-DCG@{5,10,20},
//             alpha-nDCG@{5,10,20}, NRBP, nNRBP, MAP-IA, P-IA@{5,10,20},
//             strec@{5,10,20}
//   options:  -alpha v  -beta v  -traditional  -c  -M depth  -version -help
//
// It serves as the off-device oracle for the on-device JAX diversity metrics
// (ptranking_tpu/metrics/srd.py); the Python wrapper lives in
// ptranking_tpu/metrics/ndeval.py.
//
// Numerical contract notes (deliberately preserved quirks of the original):
//  * qrels judgments are binarized (any positive value counts as 1), and
//    nrelSub accumulates one count per qrels LINE, so duplicated lines double
//    count exactly as in the original.
//  * alpha-DCG / ERR-IA arrays are "ideal-ideal" normalized only from rank
//    index 1 onward; index 0 is left as the raw head gain. The run/ideal
//    ratio (alpha-nDCG, nERR-IA) cancels the ideal-ideal factor where present.
//  * the greedy ideal ranking breaks score ties toward the lexicographically
//    LARGER docno.
//  * nNRBP = NRBP / ideal NRBP with NO zero guard: a judged topic whose qrels
//    carry only judgment-0 lines yields 0/0 = NaN in its row and in the
//    amean, exactly as the original does.
//  * topics present in the run but absent from the qrels are printed with
//    all-zero rows; the arithmetic mean divides by the number of judged
//    topics (or all qrels topics with -c).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

constexpr int kDepth = 20;         // max depth for @k measures
constexpr int kMaxNatural = 100000;

struct Options {
  double alpha = 0.5;
  double beta = 0.5;
  bool traditional = false;
  bool complete = false;  // -c: average over all qrels topics
  int depth_cut = 0;      // -M: run cutoff (0 = none)
};

[[noreturn]] void die(const std::string& msg) {
  std::fprintf(stderr, "ndeval: %s\n", msg.c_str());
  std::exit(1);
}

// Strictly non-negative integer (digits only); -1 on anything else.
int natural_number(const std::string& s) {
  if (s.empty()) return -1;
  long v = 0;
  for (char c : s) {
    if (c < '0' || c > '9') return -1;
    if (v > kMaxNatural) return -1;
    v = 10 * v + (c - '0');
  }
  return static_cast<int>(v);
}

// Run-file topics may carry a task prefix ("wt09-12" -> 12).
int parse_topic(const std::string& s) {
  if (!s.empty() && std::isdigit(static_cast<unsigned char>(s[0])))
    return natural_number(s);
  auto dash = s.find('-');
  if (dash == std::string::npos) return -1;
  return natural_number(s.substr(dash + 1));
}

std::vector<std::string> split_ws(const std::string& line, size_t max_fields) {
  std::vector<std::string> out;
  size_t i = 0, n = line.size();
  while (i < n && out.size() < max_fields) {
    while (i < n && std::isspace(static_cast<unsigned char>(line[i]))) i++;
    if (i >= n) break;
    size_t j = i;
    while (j < n && !std::isspace(static_cast<unsigned char>(line[j]))) j++;
    out.emplace_back(line.substr(i, j - i));
    i = j;
  }
  return out;
}

double rank_discount(int idx0) {  // idx0 is the 0-based rank index
  return std::log(2.0) / std::log(idx0 + 2.0);
}

// --- per-topic data ---------------------------------------------------------

struct Doc {
  std::string docno;
  int rank = 0;
  double score = 0.0;
  const std::vector<int>* rel = nullptr;  // subtopic judgments; null = unjudged
};

struct TopicMeasures {
  double err[kDepth] = {0};   // ERR-IA (ideal-ideal normalized from idx 1)
  double nerr[kDepth] = {0};  // collection-dependent normalization
  double dcg[kDepth] = {0};   // alpha-DCG (ideal-ideal normalized from idx 1)
  double ndcg[kDepth] = {0};
  double prec[kDepth] = {0};  // P-IA
  double strec[kDepth] = {0};
  double nrbp = 0.0, nnrbp = 0.0;
  double map_ia = 0.0, map = 0.0;
};

struct TopicQrels {
  int topic = 0;
  int num_subtopics = 0;         // max subtopic id + 1
  int actual_subtopics = 0;      // subtopics with >=1 positive judgment
  int nrel = 0;                  // docs relevant to >=1 subtopic
  std::vector<int> nrel_sub;     // per-subtopic positive-line counts
  std::vector<std::string> docnos;              // sorted
  std::vector<std::vector<int>> rel;            // aligned with docnos
  std::vector<size_t> ideal_order;              // greedy ideal (indices)
  TopicMeasures ideal;           // measures of the ideal ranking
};

struct TopicRun {
  int topic = 0;
  std::vector<Doc> docs;  // in rank order after preprocessing
  TopicMeasures m;
  bool judged = false;
};

// Shared gain sweep: walk `docs` in order, accumulating the alpha-discounted
// per-subtopic novelty gain of each document.
template <typename Fn>
void sweep_gains(const std::vector<Doc>& docs, int num_subtopics, double alpha,
                 int max_rank, Fn&& emit) {
  std::vector<double> gain(num_subtopics, 1.0);
  int limit = max_rank > 0 ? std::min<int>(max_rank, docs.size()) : docs.size();
  for (int i = 0; i < limit; i++) {
    double score = 0.0;
    if (docs[i].rel) {
      const auto& rel = *docs[i].rel;
      for (int j = 0; j < num_subtopics && j < static_cast<int>(rel.size()); j++)
        if (rel[j]) {
          score += gain[j];
          gain[j] *= (1.0 - alpha);
        }
    }
    emit(i, score);
  }
}

void compute_dcg_err_nrbp(const std::vector<Doc>& docs, const TopicQrels& q,
                          const Options& opt, TopicMeasures* m) {
  std::fill(std::begin(m->dcg), std::end(m->dcg), 0.0);
  std::fill(std::begin(m->err), std::end(m->err), 0.0);
  m->nrbp = 0.0;
  if (q.actual_subtopics == 0) return;

  // alpha-DCG and ERR-IA share the depth-limited gain sweep.
  sweep_gains(docs, q.num_subtopics, opt.alpha, kDepth, [&](int i, double s) {
    m->dcg[i] = s * rank_discount(i);
    m->err[i] = s / (i + 1);
  });
  // NRBP sweeps the full list with a beta decay.
  {
    std::vector<double> gain(q.num_subtopics, 1.0);
    double decay = 1.0, total = 0.0;
    for (const Doc& d : docs) {
      double score = 0.0;
      if (d.rel) {
        const auto& rel = *d.rel;
        for (int j = 0; j < q.num_subtopics && j < static_cast<int>(rel.size()); j++)
          if (rel[j]) {
            score += gain[j];
            gain[j] *= (1.0 - opt.alpha);
          }
      }
      total += score * decay;
      decay *= opt.beta;
    }
    m->nrbp = total * (1.0 - (1.0 - opt.alpha) * opt.beta) / q.actual_subtopics;
  }

  // "Ideal ideal" reference curve: a fictitious list where every rank covers
  // every live subtopic once.
  double ii_dcg[kDepth], ii_err[kDepth];
  double g = static_cast<double>(q.actual_subtopics);
  for (int i = 0; i < kDepth; i++) {
    ii_dcg[i] = g * rank_discount(i);
    ii_err[i] = g / (i + 1);
    g *= (1.0 - opt.alpha);
  }
  for (int i = 1; i < kDepth; i++) {
    m->dcg[i] += m->dcg[i - 1];
    m->err[i] += m->err[i - 1];
    ii_dcg[i] += ii_dcg[i - 1];
    ii_err[i] += ii_err[i - 1];
  }
  for (int i = 1; i < kDepth; i++) {  // index 0 intentionally left raw
    m->dcg[i] /= ii_dcg[i];
    m->err[i] /= ii_err[i];
  }
}

void compute_precision_strec(const std::vector<Doc>& docs, const TopicQrels& q,
                             TopicMeasures* m) {
  if (q.actual_subtopics == 0) return;
  std::vector<char> seen(q.num_subtopics, 0);
  int rel_count = 0, covered = 0;
  int i = 0;
  for (; i < kDepth && i < static_cast<int>(docs.size()); i++) {
    if (docs[i].rel) {
      const auto& rel = *docs[i].rel;
      for (int j = 0; j < q.num_subtopics && j < static_cast<int>(rel.size()); j++)
        if (rel[j]) {
          rel_count++;
          if (!seen[j]) { seen[j] = 1; covered++; }
        }
    }
    m->prec[i] = static_cast<double>(rel_count) / ((i + 1) * q.actual_subtopics);
    m->strec[i] = static_cast<double>(covered) / q.actual_subtopics;
  }
  for (; i < kDepth; i++) {
    m->prec[i] = static_cast<double>(rel_count) / ((i + 1) * q.actual_subtopics);
    m->strec[i] = static_cast<double>(covered) / q.actual_subtopics;
  }
}

void compute_map(const std::vector<Doc>& docs, const TopicQrels& q,
                 TopicMeasures* m) {
  m->map = m->map_ia = 0.0;
  if (q.actual_subtopics == 0) return;
  std::vector<int> sub_count(q.num_subtopics, 0);
  std::vector<double> sub_total(q.num_subtopics, 0.0);
  double count = 0.0, total = 0.0;
  for (size_t i = 0; i < docs.size(); i++) {
    if (!docs[i].rel) continue;
    const auto& rel = *docs[i].rel;
    bool first = true;
    for (int j = 0; j < q.num_subtopics && j < static_cast<int>(rel.size()); j++)
      if (rel[j]) {
        sub_count[j]++;
        sub_total[j] += sub_count[j] / static_cast<double>(i + 1);
        if (first) {
          count += 1.0;
          total += count / static_cast<double>(i + 1);
          first = false;
        }
      }
  }
  m->map = total / q.nrel;
  for (int j = 0; j < q.num_subtopics; j++)
    if (q.nrel_sub[j]) m->map_ia += sub_total[j] / q.nrel_sub[j];
  m->map_ia /= q.actual_subtopics;
}

// --- qrels ------------------------------------------------------------------

std::map<int, TopicQrels> load_qrels(const std::string& path, const Options& opt) {
  std::ifstream in(path);
  if (!in) die("cannot open qrel file \"" + path + "\"");

  // (topic, docno) -> per-subtopic judgment; plus per-line nrelSub counts.
  std::map<int, TopicQrels> topics;
  std::map<int, std::map<std::string, std::vector<int>>> judg;
  std::string line;
  int lineno = 0;
  bool any = false;
  while (std::getline(in, line)) {
    lineno++;
    if (!line.empty() && line.back() == '\r') line.pop_back();
    auto f = split_ws(line, 5);
    if (f.empty()) continue;  // my_getline-compatible: blank lines are counted
    any = true;
    int topic = f.size() >= 1 ? natural_number(f[0]) : -1;
    int sub = f.size() >= 2 ? natural_number(f[1]) : -1;
    int j = f.size() >= 4 ? natural_number(f[3]) : -1;
    if (f.size() < 4 || topic < 0 || sub < 0 || j < 0)
      die("syntax error in qrel file \"" + path + "\" at line " +
          std::to_string(lineno));
    if (j > 1) j = 1;
    auto& tq = topics[topic];
    tq.topic = topic;
    tq.num_subtopics = std::max(tq.num_subtopics, sub + 1);
    auto& rel = judg[topic][f[2]];
    if (static_cast<int>(rel.size()) <= sub) rel.resize(sub + 1, 0);
    rel[sub] = j;
    if (static_cast<int>(tq.nrel_sub.size()) <= sub) tq.nrel_sub.resize(sub + 1, 0);
    tq.nrel_sub[sub] += j;  // per-line accumulation, as in the original
  }
  if (!any) die("qrel file \"" + path + "\" is empty");

  for (auto& [topic, tq] : topics) {
    tq.nrel_sub.resize(tq.num_subtopics, 0);
    for (auto& [docno, rel] : judg[topic]) {  // std::map: docno-sorted
      rel.resize(tq.num_subtopics, 0);
      tq.docnos.push_back(docno);
      tq.rel.push_back(rel);
      if (std::any_of(rel.begin(), rel.end(), [](int r) { return r != 0; }))
        tq.nrel++;
    }
    for (int c : tq.nrel_sub)
      if (c) tq.actual_subtopics++;

    // Greedy ideal ranking (ties -> lexicographically larger docno).
    size_t n = tq.docnos.size();
    std::vector<double> gain(tq.num_subtopics, 1.0);
    std::vector<char> placed(n, 0);
    tq.ideal_order.clear();
    for (size_t rank = 0; rank < n; rank++) {
      int where = -1;
      double best = 0.0;
      for (size_t i = 0; i < n; i++) {
        if (placed[i]) continue;
        double s = 0.0;
        for (int j = 0; j < tq.num_subtopics; j++)
          if (tq.rel[i][j]) s += gain[j];
        if (where < 0 || s > best ||
            (s == best && tq.docnos[i] > tq.docnos[where]))
          { best = s; where = static_cast<int>(i); }
      }
      placed[where] = 1;
      tq.ideal_order.push_back(where);
      for (int j = 0; j < tq.num_subtopics; j++)
        if (tq.rel[where][j]) gain[j] *= (1.0 - opt.alpha);
    }

    std::vector<Doc> ideal_docs;
    ideal_docs.reserve(n);
    for (size_t idx : tq.ideal_order) {
      Doc d;
      d.docno = tq.docnos[idx];
      d.rel = &tq.rel[idx];
      ideal_docs.push_back(std::move(d));
    }
    compute_dcg_err_nrbp(ideal_docs, tq, opt, &tq.ideal);
  }
  return topics;
}

// --- run --------------------------------------------------------------------

std::map<int, TopicRun> load_run(const std::string& path, const Options& opt,
                                 std::string* runid) {
  std::ifstream in(path);
  if (!in) die("cannot open run file \"" + path + "\"");
  struct Row { int topic; Doc doc; };
  std::vector<Row> rows;
  std::string line;
  int lineno = 0;
  while (std::getline(in, line)) {
    lineno++;
    if (!line.empty() && line.back() == '\r') line.pop_back();
    auto f = split_ws(line, 7);
    if (f.empty()) continue;
    int topic, rank;
    if (f.size() < 6 || (topic = parse_topic(f[0])) < 0 ||
        (rank = natural_number(f[3])) < 0)
      die("syntax error in run file \"" + path + "\" at line " +
          std::to_string(lineno));
    if (runid->empty()) *runid = f[5];
    Row r;
    r.topic = topic;
    r.doc.docno = f[2];
    r.doc.rank = rank;
    r.doc.score = std::strtod(f[4].c_str(), nullptr);
    rows.push_back(std::move(r));
  }
  if (rows.empty()) die("run file \"" + path + "\" is empty");

  if (opt.traditional) {  // re-rank by (score desc, docno desc) per topic
    std::stable_sort(rows.begin(), rows.end(), [](const Row& a, const Row& b) {
      if (a.topic != b.topic) return a.topic < b.topic;
      if (a.doc.score != b.doc.score) return a.doc.score > b.doc.score;
      return a.doc.docno > b.doc.docno;
    });
    int cur = -1, rank = 1;
    for (auto& r : rows) {
      if (r.topic != cur) { cur = r.topic; rank = 1; }
      r.doc.rank = rank++;
    }
  }

  std::sort(rows.begin(), rows.end(), [](const Row& a, const Row& b) {
    if (a.topic != b.topic) return a.topic < b.topic;
    return a.doc.rank < b.doc.rank;
  });
  for (size_t i = 1; i < rows.size(); i++)
    if (rows[i].topic == rows[i - 1].topic &&
        rows[i].doc.rank == rows[i - 1].doc.rank)
      die("duplicate rank (" + std::to_string(rows[i].doc.rank) +
          ") for topic " + std::to_string(rows[i].topic) + " in run file \"" +
          path + "\"");

  if (opt.depth_cut > 0) {
    std::vector<Row> kept;
    int cur = -1, depth = 0;
    for (auto& r : rows) {
      depth = (r.topic == cur) ? depth + 1 : (cur = r.topic, 1);
      if (depth <= opt.depth_cut) kept.push_back(std::move(r));
    }
    rows.swap(kept);
  }

  {  // duplicate-docno check, per topic
    std::vector<std::pair<int, const std::string*>> keys;
    keys.reserve(rows.size());
    for (const auto& r : rows) keys.emplace_back(r.topic, &r.doc.docno);
    std::sort(keys.begin(), keys.end(), [](const auto& a, const auto& b) {
      if (a.first != b.first) return a.first < b.first;
      return *a.second < *b.second;
    });
    for (size_t i = 1; i < keys.size(); i++)
      if (keys[i].first == keys[i - 1].first &&
          *keys[i].second == *keys[i - 1].second)
        die("duplicate docno (" + *keys[i].second + ") for topic " +
            std::to_string(keys[i].first) + " in run file \"" + path + "\"");
  }

  std::map<int, TopicRun> out;
  for (auto& r : rows) {
    auto& tr = out[r.topic];
    tr.topic = r.topic;
    tr.docs.push_back(std::move(r.doc));
  }
  return out;
}

// --- main -------------------------------------------------------------------

void print_row(const std::string& runid, const std::string& topic,
               const TopicMeasures& m) {
  std::printf(
      "%s,%s"
      ",%.6f,%.6f,%.6f,%.6f,%.6f,%.6f,%.6f,%.6f,%.6f,%.6f"
      ",%.6f,%.6f,%.6f,%.6f,%.6f,%.6f,%.6f,%.6f,%.6f,%.6f,%.6f\n",
      runid.c_str(), topic.c_str(),
      m.err[4], m.err[9], m.err[19], m.nerr[4], m.nerr[9], m.nerr[19],
      m.dcg[4], m.dcg[9], m.dcg[19], m.ndcg[4], m.ndcg[9], m.ndcg[19],
      m.nrbp, m.nnrbp, m.map_ia,
      m.prec[4], m.prec[9], m.prec[19], m.strec[4], m.strec[9], m.strec[19]);
}

const char* kHelp =
    "ndeval [options] qrels run\n"
    "  Compute novelty and diversity evaluation measures for TREC Web tasks.\n"
    "  Evaluation measures are written to standard output as a CSV file.\n"
    "  options: -alpha v | -beta v | -traditional | -c | -M depth | -version\n"
    "  measures: ERR-IA@{5,10,20}, nERR-IA@{5,10,20}, alpha-DCG@{5,10,20},\n"
    "            alpha-nDCG@{5,10,20}, NRBP, nNRBP, MAP-IA, P-IA@{5,10,20},\n"
    "            strec@{5,10,20}\n";

}  // namespace

int main(int argc, char** argv) {
  Options opt;
  std::vector<std::string> pos;
  for (int i = 1; i < argc; i++) {
    std::string a = argv[i];
    if (a == "-version") { std::printf("ndeval: C++ clone of version 4.4\n"); return 0; }
    if (a == "-help") { std::printf("%s", kHelp); return 0; }
    if (a == "-alpha" && i + 1 < argc) {
      opt.alpha = std::atof(argv[++i]);
      if (opt.alpha < 0.0 || opt.alpha > 1.0) die("bad -alpha");
    } else if (a == "-beta" && i + 1 < argc) {
      opt.beta = std::atof(argv[++i]);
      if (opt.beta < 0.0 || opt.beta > 1.0) die("bad -beta");
    } else if (a == "-M" && i + 1 < argc) {
      opt.depth_cut = std::atoi(argv[++i]);
      if (opt.depth_cut <= 0) die("bad -M depth");
    } else if (a == "-traditional") {
      opt.traditional = true;
    } else if (!a.empty() && a[0] == '-') {
      for (size_t k = 1; k < a.size(); k++) {
        if (a[k] == 'c') opt.complete = true;
        else if (a[k] == 'a') { /* accepted for compatibility; no effect */ }
        else die("unknown option \"" + a + "\"");
      }
    } else {
      pos.push_back(a);
    }
  }
  if (pos.size() != 2) {
    std::fprintf(stderr, "Usage: ndeval [options] qrels run   (-help for usage)\n");
    return 1;
  }

  std::string runid;
  auto qrels = load_qrels(pos[0], opt);
  auto run = load_run(pos[1], opt, &runid);

  int actual_topics = 0;
  for (auto& [topic, tr] : run) {
    auto it = qrels.find(topic);
    if (it == qrels.end()) continue;
    const TopicQrels& q = it->second;
    tr.judged = true;
    actual_topics++;
    for (auto& d : tr.docs) {
      // docnos are unique per topic; look up judgments by docno
      auto lo = std::lower_bound(q.docnos.begin(), q.docnos.end(), d.docno);
      if (lo != q.docnos.end() && *lo == d.docno)
        d.rel = &q.rel[lo - q.docnos.begin()];
    }
    compute_dcg_err_nrbp(tr.docs, q, opt, &tr.m);
    for (int i = 0; i < kDepth; i++)
      if (tr.m.dcg[i] != 0.0) {
        tr.m.ndcg[i] = tr.m.dcg[i] / q.ideal.dcg[i];
        tr.m.nerr[i] = tr.m.err[i] / q.ideal.err[i];
      }
    tr.m.nnrbp = tr.m.nrbp / q.ideal.nrbp;
    compute_precision_strec(tr.docs, q, &tr.m);
    compute_map(tr.docs, q, &tr.m);
  }
  if (opt.complete) actual_topics = static_cast<int>(qrels.size());

  std::printf("runid,topic");
  std::printf(",ERR-IA@5,ERR-IA@10,ERR-IA@20");
  std::printf(",nERR-IA@5,nERR-IA@10,nERR-IA@20");
  std::printf(",alpha-DCG@5,alpha-DCG@10,alpha-DCG@20");
  std::printf(",alpha-nDCG@5,alpha-nDCG@10,alpha-nDCG@20");
  std::printf(",NRBP,nNRBP,MAP-IA");
  std::printf(",P-IA@5,P-IA@10,P-IA@20");
  std::printf(",strec@5,strec@10,strec@20\n");

  if (actual_topics == 0) {
    std::printf("%s,amean", runid.c_str());
    for (int i = 0; i < 21; i++) std::printf(",0.00");
    std::printf("\n");
    return 0;
  }

  TopicMeasures sum;
  for (const auto& [topic, tr] : run) {
    print_row(runid, std::to_string(topic), tr.m);
    for (int i = 0; i < kDepth; i++) {
      sum.err[i] += tr.m.err[i];
      sum.nerr[i] += tr.m.nerr[i];
      sum.dcg[i] += tr.m.dcg[i];
      sum.ndcg[i] += tr.m.ndcg[i];
      sum.prec[i] += tr.m.prec[i];
      sum.strec[i] += tr.m.strec[i];
    }
    sum.nrbp += tr.m.nrbp;
    sum.nnrbp += tr.m.nnrbp;
    sum.map_ia += tr.m.map_ia;
  }
  TopicMeasures mean;
  for (int i = 0; i < kDepth; i++) {
    mean.err[i] = sum.err[i] / actual_topics;
    mean.nerr[i] = sum.nerr[i] / actual_topics;
    mean.dcg[i] = sum.dcg[i] / actual_topics;
    mean.ndcg[i] = sum.ndcg[i] / actual_topics;
    mean.prec[i] = sum.prec[i] / actual_topics;
    mean.strec[i] = sum.strec[i] / actual_topics;
  }
  mean.nrbp = sum.nrbp / actual_topics;
  mean.nnrbp = sum.nnrbp / actual_topics;
  mean.map_ia = sum.map_ia / actual_topics;
  print_row(runid, "amean", mean);
  return 0;
}
