"""IRGAN: minimax adversarial LTR (point / pair / list).

TPU-native redesign of reference ptranking/ltr_adversarial/{pointwise/
irgan_point.py, pairwise/irgan_pair.py, listwise/irgan_list.py}. The
reference loops queries in Python with per-query multinomial sampling and one
optimizer step per query; here each G/D update is ONE jitted batched step
over a padded bucket:

  * per-query "valid_num = min(num_pos, samples)" variable-size sampling
    becomes fixed `samples_per_query` draws WITH replacement plus a validity
    weight (num_pos >= 1) — identical in expectation, static shapes for XLA.
  * torch.multinomial -> jax.random.categorical over masked logits; randperm
    positive selection -> uniform index over the leading positives (training
    data is presorted so positives come first, as the reference asserts at
    irgan_point.py:77).
  * the discriminator's double-sigmoid quirk is reproduced: D's scorer ends
    with a sigmoid (TL_AF='S', irgan_point.py:63) and its outputs are then fed
    to a BCE-with-logits objective (irgan_point.py:20,175).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ptranking_tpu.adversarial.base import AdversarialMachine, AdversarialPlayer
from ptranking_tpu.adversarial.util import (
    gather_subrankings,
    sample_pl_rankings,
    shuffled_truth_rankings,
    subranking_masks,
    weighted_mean,
    log_ranking_prob_bt,
    log_ranking_prob_pl,
    sample_categorical_masked,
    sample_uniform_positions,
)
from ptranking_tpu.models import ScorerConfig, apply_scorer
from ptranking_tpu.ops import masked_softmax
from ptranking_tpu.train.optimizer import OptimizerConfig

LAMBDA = 0.5  # IRGAN Eq-22 mixture weight (irgan_point.py:17)
_GUMBEL_EPS = 1e-20


def _num_pos(labels, mask):
    return jnp.sum((labels > 0) & mask, axis=-1)  # [B]


def _gather_docs(features, idx):
    """features [B, N, F], idx [B, S] -> [B, S, F]."""
    return jnp.take_along_axis(features, idx[..., None], axis=1)


def make_players(sf_para, temperature: Optional[float] = None, seed: int = 137):
    """G keeps the configured scorer; D forces a sigmoid top layer
    (irgan_point.py:56-63)."""
    g_cfg: ScorerConfig = sf_para["scorer"]
    assert g_cfg.apply_tl_af, "IRGAN requires apply_tl_af=True (irgan_point.py:57)"
    d_cfg = dataclasses.replace(g_cfg, TL_AF="S")
    opt: OptimizerConfig = sf_para["optimizer"]
    g = AdversarialPlayer(g_cfg, opt_cfg=opt, temperature=temperature, seed=seed).init()
    d = AdversarialPlayer(d_cfg, opt_cfg=opt, seed=seed + 1).init()
    return g, d


class IRGAN_Point(AdversarialMachine):
    """(reference irgan_point.py:48-232). D: BCE on generated pos/neg docs;
    G: REINFORCE with the Eq-22 importance-sampling mixture, reward (D-0.5)*2."""

    def __init__(self, sf_para=None, ad_para_dict=None, seed: int = 137,
                 mesh=None):
        super().__init__(sf_para, ad_para_dict, mesh=mesh)
        self.temperature = ad_para_dict.get("temperature", 0.5)
        self.d_epoches = ad_para_dict.get("d_epoches", 1)
        self.g_epoches = ad_para_dict.get("g_epoches", 1)
        self.ad_training_order = ad_para_dict.get("ad_training_order", "DG")
        self.samples_per_query = ad_para_dict.get("samples_per_query", 5)
        self.generator, self.discriminator = make_players(sf_para, self.temperature, seed)
        self._key = jax.random.PRNGKey(seed + 7)
        self._build()

    def _build(self):
        g, d = self.generator, self.discriminator
        S = self.samples_per_query
        g_opt, d_opt = g._optimizer, d._optimizer

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def d_step(d_params, d_opt_state, g_params, key, features, labels, mask):
            B, N, F = features.shape
            k_pos, k_neg = jax.random.split(key)
            npos = _num_pos(labels, mask)
            valid_q = (npos >= 1)
            pos_idx = sample_uniform_positions(k_pos, npos, S, N)  # [B, S]
            g_scores = g.predict_scaled(g_params, features, mask)
            neg_idx = sample_categorical_masked(k_neg, g_scores, mask, S, replacement=True)
            docs = jnp.concatenate([_gather_docs(features, pos_idx),
                                    _gather_docs(features, neg_idx)], axis=1)  # [B, 2S, F]
            targets = jnp.concatenate([jnp.ones((B, S)), jnp.zeros((B, S))], axis=1)
            dmask = jnp.broadcast_to(valid_q[:, None], (B, 2 * S))

            def loss_of(p):
                preds = apply_scorer(p, d.scorer_cfg, docs, dmask, training=True)
                bce = jax.nn.softplus(preds) - targets * preds  # BCEWithLogits
                return jnp.sum(jnp.where(dmask, bce, 0.0)) / jnp.maximum(jnp.sum(dmask), 1.0)

            loss, grads = jax.value_and_grad(loss_of)(d_params)
            updates, d_opt_state = d_opt.update(grads, d_opt_state, d_params)
            return jax.tree_util.tree_map(lambda a, u: a + u, d_params, updates), d_opt_state, loss

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def g_step(g_params, g_opt_state, d_params, key, features, labels, mask):
            B, N, F = features.shape
            SG = 5 * S
            npos = _num_pos(labels, mask)
            valid_q = (npos >= 1)

            def loss_of(p):
                g_scores = apply_scorer(p, g.scorer_cfg, features, mask, training=True)
                if g.temperature not in (None, 1.0):
                    g_scores = g_scores / g.temperature
                g_probs = masked_softmax(g_scores, mask)
                pos_positions = jnp.arange(N)[None] < npos[:, None]
                prob_is = g_probs * (1.0 - LAMBDA) + jnp.where(
                    pos_positions, LAMBDA / jnp.maximum(npos[:, None], 1), 0.0)
                prob_is = jnp.where(mask, prob_is, 0.0)
                choose = sample_categorical_masked(
                    key, jnp.log(jnp.maximum(prob_is, 1e-20)), mask, SG, replacement=True)
                gp = jnp.take_along_axis(g_probs, choose, axis=1)
                pis = jnp.take_along_axis(prob_is, choose, axis=1)
                is_w = jax.lax.stop_gradient(gp / jnp.maximum(pis, 1e-20))
                docs = _gather_docs(features, choose)
                d_preds = apply_scorer(d_params, d.scorer_cfg, docs,
                                       jnp.broadcast_to(valid_q[:, None], (B, SG)),
                                       training=False)
                reward = jax.lax.stop_gradient((d_preds - 0.5) * 2.0)
                terms = jnp.log(jnp.maximum(gp, 1e-20)) * reward * is_w
                w = jnp.broadcast_to(valid_q[:, None], terms.shape)
                return -jnp.sum(jnp.where(w, terms, 0.0)) / jnp.maximum(jnp.sum(w), 1.0)

            loss, grads = jax.value_and_grad(loss_of)(g_params)
            updates, g_opt_state = g_opt.update(grads, g_opt_state, g_params)
            return jax.tree_util.tree_map(lambda a, u: a + u, g_params, updates), g_opt_state, loss

        self._d_step, self._g_step = d_step, g_step

    def _d_pass(self, train_data):
        # K-batch fused pass (base._fused_pass): dispatch-bound otherwise
        self._fused_pass(self._d_step, self.discriminator,
                         self.generator.params, train_data)

    def _g_pass(self, train_data) -> bool:
        return self._fused_pass(self._g_step, self.generator,
                                self.discriminator.params, train_data)

    def mini_max_train(self, train_data=None) -> bool:
        batches = list(train_data)
        if self.ad_training_order == "DG":
            for _ in range(self.d_epoches):
                self._d_pass(batches)
            for _ in range(self.g_epoches):
                if self._g_pass(batches):
                    return True
        else:
            for _ in range(self.g_epoches):
                if self._g_pass(batches):
                    return True
            for _ in range(self.d_epoches):
                self._d_pass(batches)
        return False


class IRGAN_Pair(AdversarialMachine):
    """(reference irgan_pair.py:50-236). Negatives drawn from the non-positive
    tail; D: hinge (svm) or log pairwise loss; G: REINFORCE with pairwise
    reward sigma(max(0, 1-(s+ - s-))) or log sigma(s- - s+)."""

    def __init__(self, sf_para=None, ad_para_dict=None, seed: int = 137,
                 mesh=None):
        super().__init__(sf_para, ad_para_dict, mesh=mesh)
        self.loss_type = ad_para_dict.get("loss_type", "svm")
        self.temperature = ad_para_dict.get("temperature", 0.5)
        self.d_epoches = ad_para_dict.get("d_epoches", 1)
        self.g_epoches = ad_para_dict.get("g_epoches", 1)
        self.ad_training_order = ad_para_dict.get("ad_training_order", "DG")
        self.samples_per_query = ad_para_dict.get("samples_per_query", 5)
        # truth-side pair sampling scheme (reference pair_sampling.py:27-150):
        # uniform (reference IRGAN_Pair's randperm positives), discounted
        # (generate_true_pairs), BT (sample_pairs_BT on labels), Gaussian
        # (sample_pairs_gaussian on labels)
        self.truth_sampling = ad_para_dict.get("truth_sampling", "uniform")
        assert self.truth_sampling in ("uniform", "discounted", "BT", "Gaussian")
        self.generator, self.discriminator = make_players(sf_para, self.temperature, seed)
        self._key = jax.random.PRNGKey(seed + 11)
        self._build()

    def _build(self):
        g, d = self.generator, self.discriminator
        S = self.samples_per_query
        loss_type = self.loss_type
        truth_sampling = self.truth_sampling
        g_opt, d_opt = g._optimizer, d._optimizer

        def sample_pairs(g_params, key, features, labels, mask, from_sigmoid: bool):
            B, N, _ = features.shape
            k_pos, k_neg = jax.random.split(key)
            npos = _num_pos(labels, mask)
            valid_q = (npos >= 1) & (jnp.sum(mask, -1) - npos >= 1)
            pos_idx = sample_uniform_positions(k_pos, npos, S, N)
            g_scores = g.predict_scaled(g_params, features, mask)
            neg_mask = mask & (jnp.arange(N)[None] >= npos[:, None])  # non-positives only
            logits = jax.nn.log_sigmoid(g_scores) if from_sigmoid else g_scores
            neg_idx = sample_categorical_masked(k_neg, logits, neg_mask, S, replacement=True)
            return pos_idx, neg_idx, valid_q, g_scores

        def truth_heads(key, labels, mask):
            """Truth-side positive-doc indices per the configured scheme: the
            HEAD of a sampled true pair (reference pair_sampling.py samplers).
            The pair's negative leg always comes from the GENERATOR — without
            it D decouples from G and the minimax degenerates."""
            from ptranking_tpu.adversarial.util import (
                generate_true_pairs, sample_pairs_bt, sample_pairs_gaussian)

            if truth_sampling == "discounted":
                head, _tail, has = generate_true_pairs(key, labels, mask, S)
                return head, has
            if truth_sampling == "BT":
                head, _tail = sample_pairs_bt(key, labels, mask, S)
            else:  # Gaussian
                head, _tail = sample_pairs_gaussian(key, labels, mask, S)
            return head, _num_pos(labels, mask) >= 1

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def d_step(d_params, d_opt_state, g_params, key, features, labels, mask):
            B, N, _ = features.shape
            if truth_sampling == "uniform":
                pos_idx, neg_idx, valid_q, _ = sample_pairs(
                    g_params, key, features, labels, mask, False)
            else:
                k_t, k_n = jax.random.split(key)
                pos_idx, pos_ok = truth_heads(k_t, labels, mask)
                # negatives from the generator, exactly as the uniform mode
                npos = _num_pos(labels, mask)
                g_scores = g.predict_scaled(g_params, features, mask)
                neg_mask = mask & (jnp.arange(N)[None] >= npos[:, None])
                neg_idx = sample_categorical_masked(k_n, g_scores, neg_mask, S,
                                                    replacement=True)
                valid_q = pos_ok & (jnp.sum(mask, -1) - npos >= 1)
            pos_docs, neg_docs = _gather_docs(features, pos_idx), _gather_docs(features, neg_idx)
            smask = jnp.broadcast_to(valid_q[:, None], (B, S))

            def loss_of(p):
                sp = apply_scorer(p, d.scorer_cfg, pos_docs, smask, training=True)
                sn = apply_scorer(p, d.scorer_cfg, neg_docs, smask, training=True)
                if loss_type == "svm":
                    l = jnp.maximum(0.0, 1.0 - (sp - sn))
                else:
                    l = -jax.nn.log_sigmoid(sp - sn)
                return jnp.sum(jnp.where(smask, l, 0.0)) / jnp.maximum(jnp.sum(smask), 1.0)

            loss, grads = jax.value_and_grad(loss_of)(d_params)
            updates, d_opt_state = d_opt.update(grads, d_opt_state, d_params)
            return jax.tree_util.tree_map(lambda a, u: a + u, d_params, updates), d_opt_state, loss

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def g_step(g_params, g_opt_state, d_params, key, features, labels, mask):
            B, N, _ = features.shape
            npos = _num_pos(labels, mask)
            valid_q = (npos >= 1)
            k_pos, k_neg = jax.random.split(key)
            pos_idx = sample_uniform_positions(k_pos, npos, S, N)
            pos_docs = _gather_docs(features, pos_idx)
            smask = jnp.broadcast_to(valid_q[:, None], (B, S))

            def loss_of(p):
                g_scores = apply_scorer(p, g.scorer_cfg, features, mask, training=True)
                if g.temperature not in (None, 1.0):
                    g_scores = g_scores / g.temperature
                g_probs = jax.nn.sigmoid(g_scores)  # irgan_pair.py:224
                neg_idx = sample_categorical_masked(
                    k_neg, jnp.log(jnp.maximum(jnp.where(mask, g_probs, 0.0), 1e-20)),
                    mask, S, replacement=True)
                neg_docs = _gather_docs(features, neg_idx)
                dp = apply_scorer(d_params, d.scorer_cfg, pos_docs, smask, training=False)
                dn = apply_scorer(d_params, d.scorer_cfg, neg_docs, smask, training=False)
                if loss_type == "svm":
                    reward = jax.nn.sigmoid(jnp.maximum(0.0, 1.0 - (dp - dn)))
                else:
                    reward = jax.nn.log_sigmoid(dn - dp)
                reward = jax.lax.stop_gradient(reward)
                gp = jnp.take_along_axis(g_probs, neg_idx, axis=1)
                terms = jnp.log(jnp.maximum(gp, 1e-20)) * reward
                return -jnp.sum(jnp.where(smask, terms, 0.0)) / jnp.maximum(jnp.sum(smask), 1.0)

            loss, grads = jax.value_and_grad(loss_of)(g_params)
            updates, g_opt_state = g_opt.update(grads, g_opt_state, g_params)
            return jax.tree_util.tree_map(lambda a, u: a + u, g_params, updates), g_opt_state, loss

        self._d_step, self._g_step = d_step, g_step

    mini_max_train = IRGAN_Point.mini_max_train
    _d_pass = IRGAN_Point._d_pass
    _g_pass = IRGAN_Point._g_pass


class IRGAN_List(AdversarialMachine):
    """(reference irgan_list.py:24-511). G samples rankings via Gumbel-softmax
    PL; D scores sampled top-k sub-rankings with PL/BT ranking log-probs;
    truth rankings come from per-sample tie shuffles of the (presorted)
    labels."""

    def __init__(self, sf_para=None, ad_para_dict=None, seed: int = 137,
                 mesh=None):
        super().__init__(sf_para, ad_para_dict, mesh=mesh)
        self.temperature = ad_para_dict.get("temperature", 0.5)
        self.top_k = ad_para_dict.get("top_k", 5)
        self.samples_per_query = ad_para_dict.get("samples_per_query", 5)
        self.d_epoches = ad_para_dict.get("d_epoches", 1)
        self.g_epoches = ad_para_dict.get("g_epoches", 1)
        self.ad_training_order = ad_para_dict.get("ad_training_order", "DG")
        self.PL_discriminator = ad_para_dict.get("PL_D", True)
        # reference hard-codes False ("False is a must", irgan_list.py:127)
        self.replace_trick_4_discriminator = ad_para_dict.get("repTrick_D", False)
        self.replace_trick_4_generator = ad_para_dict.get("repTrick_G", False)
        self.drop_log = ad_para_dict.get("dropLog", True)  # reference default
        self.generator, self.discriminator = make_players(sf_para, self.temperature, seed)
        self._key = jax.random.PRNGKey(seed + 13)
        self._build()

    def _sample_rankings(self, key, scores, mask, S, k):
        return sample_pl_rankings(key, scores, mask, S, k, self.temperature)

    def _build(self):
        g, d = self.generator, self.discriminator
        S, k = self.samples_per_query, self.top_k
        pl_d = self.PL_discriminator
        g_opt, d_opt = g._optimizer, d._optimizer
        log_prob = log_ranking_prob_pl if pl_d else log_ranking_prob_bt

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def d_step(d_params, d_opt_state, g_params, key, features, labels, mask):
            B, N, F = features.shape
            k_g, k_t = jax.random.split(key)
            g_scores = g.predict_scaled(g_params, features, mask)
            gen_order, _ = self._sample_rankings(k_g, g_scores, mask, S, k)
            std_order = shuffled_truth_rankings(k_t, labels, mask, S, k)
            gen_docs = gather_subrankings(features, gen_order)
            std_docs = gather_subrankings(features, std_order)
            # short lists cannot fill top-k, and all-padded remainder queries
            # of bucketed batches must not train D at all
            sub_mask, w = subranking_masks(mask, S, k)

            def loss_of(p):
                d_gen = apply_scorer(p, d.scorer_cfg, gen_docs, sub_mask, training=True)
                d_std = apply_scorer(p, d.scorer_cfg, std_docs, sub_mask, training=True)
                lp_gen = log_prob(d_gen, sub_mask)
                lp_std = log_prob(d_std, sub_mask)
                if self.replace_trick_4_discriminator:
                    return weighted_mean(lp_gen - lp_std, w)
                # reference's "standard CE" (irgan_list.py:336-338) — faithful quirk:
                return -(weighted_mean(lp_std, w)
                         + weighted_mean(jnp.log(jnp.maximum(1.0 - lp_gen, 1e-20)), w))

            loss, grads = jax.value_and_grad(loss_of)(d_params)
            updates, d_opt_state = d_opt.update(grads, d_opt_state, d_params)
            return jax.tree_util.tree_map(lambda a, u: a + u, d_params, updates), d_opt_state, loss

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def g_step(g_params, g_opt_state, d_params, key, features, labels, mask):
            B, N, F = features.shape
            d_scores_full = apply_scorer(d_params, d.scorer_cfg, features, mask, training=False)

            def loss_of(p):
                g_scores = apply_scorer(p, g.scorer_cfg, features, mask, training=True)
                if g.temperature not in (None, 1.0):
                    g_scores = g_scores / g.temperature
                order, top_probs = self._sample_rankings(key, g_scores, mask, S, k)
                sub_mask, w = subranking_masks(mask, S, k)
                lp_g = log_ranking_prob_pl(
                    jnp.log(jnp.maximum(top_probs.reshape(B * S, k), 1e-20)), sub_mask)
                d_sorted = jnp.take_along_axis(
                    d_scores_full[:, None, :].repeat(S, 1), order, axis=-1).reshape(B * S, k)
                lp_d = log_prob(d_sorted, sub_mask)
                if self.replace_trick_4_generator:
                    reward = -jnp.exp(lp_d) if self.drop_log else -lp_d
                else:
                    reward = (jnp.exp(1.0 - lp_d) if self.drop_log
                              else jnp.log(jnp.maximum(1.0 - lp_d, 1e-20)))
                reward = jax.lax.stop_gradient(reward)
                return weighted_mean(lp_g * reward, w)

            loss, grads = jax.value_and_grad(loss_of)(g_params)
            updates, g_opt_state = g_opt.update(grads, g_opt_state, g_params)
            return jax.tree_util.tree_map(lambda a, u: a + u, g_params, updates), g_opt_state, loss

        self._d_step, self._g_step = d_step, g_step

    mini_max_train = IRGAN_Point.mini_max_train
    _d_pass = IRGAN_Point._d_pass
    _g_pass = IRGAN_Point._g_pass
