"""The LTR loss zoo: a registry of pure functions.

Where the reference makes every model a NeuralRanker subclass whose
custom_loss_function mutates the optimizer in place (reference
base/ranker.py:605-613), here a "model" is (scorer config, loss fn, hyper
dict): losses are pure `f(scores, labels, mask, *, key, **hyper) -> scalar`
and one jitted train step serves the whole zoo.

The registry includes SoftRank/MDPRank/DASALC, which exist in the reference
but are missing from its CLI registry (reference ltr.py:21-35 never imports
them, so globals()[model_id] raises — SURVEY.md §2.3 fidelity note). The
phantom ids the reference name-drops with no implementation anywhere
(TwinRank, HistogramAP, ...) raise a clean KeyError here.
"""

from typing import Any, Callable, Dict

from ptranking_tpu.losses.pointwise import rank_mse
from ptranking_tpu.losses.pairwise import ranknet
from ptranking_tpu.losses.listwise import (
    approx_ndcg,
    lambda_loss,
    lambda_rank,
    listmle,
    listnet,
    mdp_rank,
    neural_ndcg,
    rank_cosine,
    soft_rank,
    st_listnet,
)
from ptranking_tpu.losses.wassrank import wass_rank

LossFn = Callable[..., Any]

# model_id -> loss fn (reference model inventory: SURVEY.md §2.3)
LOSSES: Dict[str, LossFn] = {
    "RankMSE": rank_mse,
    "RankNet": ranknet,
    "LambdaRank": lambda_rank,
    "ListNet": listnet,
    "STListNet": st_listnet,
    "ListMLE": listmle,
    "RankCosine": rank_cosine,
    "ApproxNDCG": approx_ndcg,
    "LambdaLoss": lambda_loss,
    "SoftRank": soft_rank,
    "MDPRank": mdp_rank,
    "WassRank": wass_rank,
    "DASALC": listnet,  # ListNet loss on the DASALC listwise scorer (dasalc.py:8-36)
    # beyond the reference: differentiable-sorting nDCG (PAPERS.md,
    # arXiv:2102.07831) — the relaxed permutation is MXU-shaped matmuls
    "NeuralNDCG": neural_ndcg,
}

# Per-model default hyper-parameters, mirroring each <Model>Parameter
# .default_para_dict in the reference.
DEFAULT_PARAS: Dict[str, Dict[str, Any]] = {
    "RankMSE": {},
    "RankNet": {"sigma": 1.0},  # ranknet.py:95
    "LambdaRank": {"sigma": 1.0},  # lambdarank.py:104
    "ListNet": {},
    "STListNet": {"temperature": 1.0},  # st_listnet.py:73
    "ListMLE": {},
    "RankCosine": {},
    "ApproxNDCG": {"alpha": 10.0},  # approxNDCG.py:128
    "LambdaLoss": {"loss_type": "NDCG_Loss2", "k": 5, "sigma": 1.0, "mu": 5.0},  # lambdaloss.py:168
    "SoftRank": {"delta": 2.0, "top_k": None},  # softrank.py:95
    "MDPRank": {"distribution": "PL", "temperature": 1.0, "gamma": 1.0, "top_k": 10},  # mdprank.py:95
    "WassRank": {
        "mode": "SinkhornOT", "sh_itr": 20, "lam": 0.1, "smooth_type": "ST",
        "norm_type": "BothST", "cost_type": "eg", "non_rele_gap": 100.0,
        "var_penalty": 2.718281828459045, "gain_base": 4.0,
    },  # wassRank.py:102-103
    "DASALC": {},
    "NeuralNDCG": {"temperature": 1.0, "top_k": None, "sinkhorn_iters": 10},
}

# Models whose loss consumes a PRNG key every step.
STOCHASTIC = {"STListNet", "ListMLE", "MDPRank"}

# Models that require the listwise (self-attention) scorer.
REQUIRES_LISTSF = {"DASALC"}


def get_loss(model_id: str) -> LossFn:
    try:
        return LOSSES[model_id]
    except KeyError:
        raise KeyError(
            f"unknown model id {model_id!r}; implemented: {sorted(LOSSES)}"
        ) from None


__all__ = ["LOSSES", "DEFAULT_PARAS", "STOCHASTIC", "REQUIRES_LISTSF", "get_loss"]
