"""IRFGAN: f-divergence adversarial LTR (point / pair / list).

TPU-native redesign of reference ptranking/ltr_adversarial/{pointwise/
irfgan_point.py, pairwise/irfgan_pair.py, listwise/irfgan_list.py}: the
variational f-GAN objective
    D: min  E_fake[f*(T(D))] - E_true[T(D)]
    G: min -E_fake[log q(x) * f*(T(D(x)))]
with (T, f*) = (activation, conjugate) per divergence
(util/f_divergence.py:9-76). Sampling mechanics mirror the IRGAN machines.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ptranking_tpu.adversarial.base import AdversarialMachine
from ptranking_tpu.adversarial.irgan import (
    IRGAN_Point,
    _gather_docs,
    _num_pos,
    make_players,
)
from ptranking_tpu.adversarial.util import (
    get_f_divergence_functions,
    sample_categorical_masked,
    sample_uniform_positions,
    gather_subrankings,
    sample_pl_rankings,
    shuffled_truth_rankings,
    subranking_masks,
    weighted_mean,
)
from ptranking_tpu.models import apply_scorer
from ptranking_tpu.ops import masked_softmax


class IRFGAN_Point(AdversarialMachine):
    """(reference irfgan_point.py). True docs: uniform positives; fake docs:
    softmax(G) samples. D minimises conj(act(fake)) - act(true); G REINFORCE
    with conj(act(D(fake))) rewards."""

    def __init__(self, sf_para=None, ad_para_dict=None, seed: int = 137,
                 mesh=None):
        super().__init__(sf_para, ad_para_dict, mesh=mesh)
        self.f_div_id = ad_para_dict.get("f_div_id", "KL")
        self.activation_f, self.conjugate_f = get_f_divergence_functions(self.f_div_id)
        self.d_epoches = ad_para_dict.get("d_epoches", 1)
        self.g_epoches = ad_para_dict.get("g_epoches", 1)
        self.ad_training_order = ad_para_dict.get("ad_training_order", "DG")
        self.samples_per_query = ad_para_dict.get("samples_per_query", 5)
        self.temperature = ad_para_dict.get("temperature", None)
        self.generator, self.discriminator = make_players(sf_para, self.temperature, seed)
        self._key = jax.random.PRNGKey(seed + 17)
        self._build()

    def _build(self):
        g, d = self.generator, self.discriminator
        S = self.samples_per_query
        act, conj = self.activation_f, self.conjugate_f
        g_opt, d_opt = g._optimizer, d._optimizer

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def d_step(d_params, d_opt_state, g_params, key, features, labels, mask):
            B, N, F = features.shape
            k_pos, k_neg = jax.random.split(key)
            npos = _num_pos(labels, mask)
            valid_q = (npos >= 1)
            pos_idx = sample_uniform_positions(k_pos, npos, S, N)
            g_scores = g.predict_scaled(g_params, features, mask)
            neg_idx = sample_categorical_masked(k_neg, g_scores, mask, S, replacement=True)
            true_docs = _gather_docs(features, pos_idx)
            fake_docs = _gather_docs(features, neg_idx)
            smask = jnp.broadcast_to(valid_q[:, None], (B, S))

            def loss_of(p):
                t_true = apply_scorer(p, d.scorer_cfg, true_docs, smask, training=True)
                t_fake = apply_scorer(p, d.scorer_cfg, fake_docs, smask, training=True)
                denom = jnp.maximum(jnp.sum(smask), 1.0)
                return (jnp.sum(jnp.where(smask, conj(act(t_fake)), 0.0))
                        - jnp.sum(jnp.where(smask, act(t_true), 0.0))) / denom

            loss, grads = jax.value_and_grad(loss_of)(d_params)
            updates, d_opt_state = d_opt.update(grads, d_opt_state, d_params)
            return jax.tree_util.tree_map(lambda a, u: a + u, d_params, updates), d_opt_state, loss

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def g_step(g_params, g_opt_state, d_params, key, features, labels, mask):
            B, N, F = features.shape
            npos = _num_pos(labels, mask)
            valid_q = (npos >= 1)

            def loss_of(p):
                g_scores = apply_scorer(p, g.scorer_cfg, features, mask, training=True)
                if g.temperature not in (None, 1.0):
                    g_scores = g_scores / g.temperature
                g_probs = masked_softmax(g_scores, mask)
                neg_idx = sample_categorical_masked(key, g_scores, mask, S, replacement=False)
                gp = jnp.take_along_axis(g_probs, neg_idx, axis=1)
                fake_docs = _gather_docs(features, neg_idx)
                # without-replacement sampling can exhaust a short list: the
                # Gumbel-top-k tail then points at pad docs (reference caps at
                # valid_num per query, irfgan_point.py:192) — mask them out
                picked_real = jnp.take_along_axis(mask, neg_idx, axis=1)
                smask = jnp.broadcast_to(valid_q[:, None], (B, S)) & picked_real
                t_fake = apply_scorer(d_params, d.scorer_cfg, fake_docs, smask, training=False)
                reward = jax.lax.stop_gradient(conj(act(t_fake)))
                terms = jnp.log(jnp.maximum(gp, 1e-20)) * reward
                return -jnp.sum(jnp.where(smask, terms, 0.0)) / jnp.maximum(jnp.sum(smask), 1.0)

            loss, grads = jax.value_and_grad(loss_of)(g_params)
            updates, g_opt_state = g_opt.update(grads, g_opt_state, g_params)
            return jax.tree_util.tree_map(lambda a, u: a + u, g_params, updates), g_opt_state, loss

        self._d_step, self._g_step = d_step, g_step

    mini_max_train = IRGAN_Point.mini_max_train
    _d_pass = IRGAN_Point._d_pass
    _g_pass = IRGAN_Point._g_pass


class IRFGAN_Pair(AdversarialMachine):
    """(reference irfgan_pair.py:96-174). True pairs ~ position-discounted
    label gaps; fake pairs ~ Bernoulli(BT(G score diffs)). D on pairwise score
    DIFFS with the f-div objective; G weights log BT probs by conj(act(.))."""

    def __init__(self, sf_para=None, ad_para_dict=None, seed: int = 137,
                 mesh=None):
        super().__init__(sf_para, ad_para_dict, mesh=mesh)
        self.f_div_id = ad_para_dict.get("f_div_id", "KL")
        self.activation_f, self.conjugate_f = get_f_divergence_functions(self.f_div_id)
        self.samples_per_query = ad_para_dict.get("samples_per_query", 5)
        self.temperature = ad_para_dict.get("temperature", None)
        self.d_epoches = ad_para_dict.get("d_epoches", 1)
        self.g_epoches = ad_para_dict.get("g_epoches", 1)
        self.ad_training_order = ad_para_dict.get("ad_training_order", "DG")
        self.generator, self.discriminator = make_players(sf_para, self.temperature, seed)
        self._key = jax.random.PRNGKey(seed + 19)
        self._build()

    def _true_pair_logits(self, labels, mask):
        """Position-discounted positive label gaps as pair sampling logits
        (reference get_weighted_clipped_pos_diffs, pair_sampling.py:26-48)."""
        n = labels.shape[-1]
        diffs = jnp.maximum(labels[..., :, None] - labels[..., None, :], 0.0)
        disc = 1.0 / jnp.log2(2.0 + jnp.arange(n, dtype=labels.dtype))
        w = diffs * disc[None, :, None] * disc[None, None, :]
        valid = mask[..., :, None] & mask[..., None, :]
        w = jnp.where(valid, w, 0.0)
        return jnp.log(jnp.maximum(w, 1e-20)), jnp.sum(w, axis=(-2, -1)) > 0

    def _build(self):
        g, d = self.generator, self.discriminator
        S = self.samples_per_query
        act, conj = self.activation_f, self.conjugate_f
        g_opt, d_opt = g._optimizer, d._optimizer

        def flat_sample(key, logits2d, S):
            B, N, _ = logits2d.shape
            flat = logits2d.reshape(B, N * N)
            idx = jax.random.categorical(key, flat[:, None, :], axis=-1,
                                         shape=(B, S))
            return idx // N, idx % N

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def joint_step(g_params, g_opt_state, d_params, d_opt_state, key,
                       features, labels, mask):
            B, N, F = features.shape
            k_true, k_fake, k_g = jax.random.split(key, 3)
            true_logits, has_pairs = self._true_pair_logits(labels, mask)
            th, tt = flat_sample(k_true, true_logits, S)
            g_scores = g.predict_scaled(g_params, features, mask)
            bt = jax.nn.log_sigmoid(g_scores[..., :, None] - g_scores[..., None, :])
            valid = mask[..., :, None] & mask[..., None, :]
            bt = jnp.where(valid, bt, -1e30)
            fh, ft = flat_sample(k_fake, bt, S)
            smask = jnp.broadcast_to(has_pairs[:, None], (B, S))

            def docs(idx):
                return _gather_docs(features, idx)

            def d_loss_of(p):
                t_true = (apply_scorer(p, d.scorer_cfg, docs(th), smask, training=True)
                          - apply_scorer(p, d.scorer_cfg, docs(tt), smask, training=True))
                t_fake = (apply_scorer(p, d.scorer_cfg, docs(fh), smask, training=True)
                          - apply_scorer(p, d.scorer_cfg, docs(ft), smask, training=True))
                denom = jnp.maximum(jnp.sum(smask), 1.0)
                return (jnp.sum(jnp.where(smask, conj(act(t_fake)), 0.0))
                        - jnp.sum(jnp.where(smask, act(t_true), 0.0))) / denom

            d_loss, d_grads = jax.value_and_grad(d_loss_of)(d_params)
            d_updates, d_opt_state = d_opt.update(d_grads, d_opt_state, d_params)
            d_params = jax.tree_util.tree_map(lambda a, u: a + u, d_params, d_updates)

            def g_loss_of(p):
                gs = apply_scorer(p, g.scorer_cfg, features, mask, training=True)
                if g.temperature not in (None, 1.0):
                    gs = gs / g.temperature
                log_bt = jax.nn.log_sigmoid(gs[..., :, None] - gs[..., None, :])
                lp = jnp.take_along_axis(
                    log_bt.reshape(B, N * N), (fh * N + ft), axis=1)
                dh = apply_scorer(d_params, d.scorer_cfg, docs(fh), smask, training=False)
                dt = apply_scorer(d_params, d.scorer_cfg, docs(ft), smask, training=False)
                reward = jax.lax.stop_gradient(conj(act(dh - dt)))
                return -jnp.sum(jnp.where(smask, lp * reward, 0.0)) / jnp.maximum(jnp.sum(smask), 1.0)

            g_loss, g_grads = jax.value_and_grad(g_loss_of)(g_params)
            g_updates, g_opt_state = g_opt.update(g_grads, g_opt_state, g_params)
            g_params = jax.tree_util.tree_map(lambda a, u: a + u, g_params, g_updates)
            return g_params, g_opt_state, d_params, d_opt_state, d_loss, g_loss

        self._joint_step = joint_step

        # K-batch fused joint pass (see base._fused_pass): both players
        # update inside one scanned dispatch
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
        def joint_scan(g_params, g_opt, d_params, d_opt, key, f_k, l_k, m_k):
            K = f_k.shape[0]
            keys = jax.random.split(key, K)

            def body(carry, inp):
                g_params, g_opt, d_params, d_opt = carry
                sub, f, l, m = inp
                g_params, g_opt, d_params, d_opt, d_loss, g_loss = joint_step(
                    g_params, g_opt, d_params, d_opt, sub, f, l, m)
                return (g_params, g_opt, d_params, d_opt), g_loss

            carry, g_losses = jax.lax.scan(
                body, (g_params, g_opt, d_params, d_opt), (keys, f_k, l_k, m_k))
            return (*carry, jnp.sum(g_losses))

        self._joint_scan = joint_scan

    def mini_max_train(self, train_data=None) -> bool:
        from ptranking_tpu.utils.chunking import iter_shape_chunks

        g, d = self.generator, self.discriminator
        for chunk, fused in iter_shape_chunks(train_data, self.scan_steps):
            if fused:
                f = jnp.stack([jnp.asarray(b.features) for b in chunk])
                l = jnp.stack([jnp.asarray(b.labels) for b in chunk])
                m = jnp.stack([jnp.asarray(b.mask) for b in chunk])
                self._key, sub = jax.random.split(self._key)
                (g.params, g.opt_state, d.params, d.opt_state, g_loss) = \
                    self._joint_scan(g.params, g.opt_state, d.params,
                                     d.opt_state, sub, f, l, m)
                if not bool(jnp.isfinite(g_loss)):
                    return True
            else:
                for b in chunk:
                    self._key, sub = jax.random.split(self._key)
                    (g.params, g.opt_state, d.params, d.opt_state, _d_loss, g_loss) = \
                        self._joint_step(g.params, g.opt_state, d.params,
                                         d.opt_state, sub,
                                         jnp.asarray(b.features),
                                         jnp.asarray(b.labels),
                                         jnp.asarray(b.mask))
                    if not bool(jnp.isfinite(g_loss)):
                        return True
        return False


class IRFGAN_List(AdversarialMachine):
    """(reference irfgan_list.py). IRGAN_List sampling with the f-div
    objective on PL ranking log-probs of truth vs generated sub-rankings."""

    def __init__(self, sf_para=None, ad_para_dict=None, seed: int = 137,
                 mesh=None):
        super().__init__(sf_para, ad_para_dict, mesh=mesh)
        self.f_div_id = ad_para_dict.get("f_div_id", "KL")
        self.activation_f, self.conjugate_f = get_f_divergence_functions(self.f_div_id)
        self.temperature = ad_para_dict.get("temperature", 0.5)
        self.top_k = ad_para_dict.get("top_k", 5)
        self.samples_per_query = ad_para_dict.get("samples_per_query", 5)
        self.d_epoches = ad_para_dict.get("d_epoches", 1)
        self.g_epoches = ad_para_dict.get("g_epoches", 1)
        self.ad_training_order = ad_para_dict.get("ad_training_order", "DG")
        self.generator, self.discriminator = make_players(sf_para, self.temperature, seed)
        self._key = jax.random.PRNGKey(seed + 23)
        self._build()

    def _sample_rankings(self, key, scores, mask, S, k):
        return sample_pl_rankings(key, scores, mask, S, k, self.temperature)

    def _build(self):
        from ptranking_tpu.adversarial.util import log_ranking_prob_pl

        g, d = self.generator, self.discriminator
        S, k = self.samples_per_query, self.top_k
        act, conj = self.activation_f, self.conjugate_f
        g_opt, d_opt = g._optimizer, d._optimizer
        _GUM = 1e-20

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def d_step(d_params, d_opt_state, g_params, key, features, labels, mask):
            B, N, F = features.shape
            k_g, k_t = jax.random.split(key)
            g_scores = g.predict_scaled(g_params, features, mask)
            gen_order, _ = self._sample_rankings(k_g, g_scores, mask, S, k)
            std_order = shuffled_truth_rankings(k_t, labels, mask, S, k)
            gen_docs = gather_subrankings(features, gen_order)
            std_docs = gather_subrankings(features, std_order)
            sub_mask, w = subranking_masks(mask, S, k)

            def loss_of(p):
                lp_gen = log_ranking_prob_pl(
                    apply_scorer(p, d.scorer_cfg, gen_docs, sub_mask, training=True), sub_mask)
                lp_std = log_ranking_prob_pl(
                    apply_scorer(p, d.scorer_cfg, std_docs, sub_mask, training=True), sub_mask)
                return weighted_mean(conj(act(lp_gen)), w) - weighted_mean(act(lp_std), w)

            loss, grads = jax.value_and_grad(loss_of)(d_params)
            updates, d_opt_state = d_opt.update(grads, d_opt_state, d_params)
            return jax.tree_util.tree_map(lambda a, u: a + u, d_params, updates), d_opt_state, loss

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def g_step(g_params, g_opt_state, d_params, key, features, labels, mask):
            B, N, F = features.shape
            d_scores_full = apply_scorer(d_params, d.scorer_cfg, features, mask, training=False)

            def loss_of(p):
                gs = apply_scorer(p, g.scorer_cfg, features, mask, training=True)
                if g.temperature not in (None, 1.0):
                    gs = gs / g.temperature
                order, top_probs = self._sample_rankings(key, gs, mask, S, k)
                sub_mask, w = subranking_masks(mask, S, k)
                lp_g = log_ranking_prob_pl(
                    jnp.log(jnp.maximum(top_probs.reshape(B * S, k), _GUM)), sub_mask)
                d_sorted = jnp.take_along_axis(
                    d_scores_full[:, None, :].repeat(S, 1), order, axis=-1).reshape(B * S, k)
                lp_d = log_ranking_prob_pl(d_sorted, sub_mask)
                reward = jax.lax.stop_gradient(conj(act(lp_d)))
                return -weighted_mean(lp_g * reward, w)

            loss, grads = jax.value_and_grad(loss_of)(g_params)
            updates, g_opt_state = g_opt.update(grads, g_opt_state, g_params)
            return jax.tree_util.tree_map(lambda a, u: a + u, g_params, updates), g_opt_state, loss

        self._d_step, self._g_step = d_step, g_step

    mini_max_train = IRGAN_Point.mini_max_train
    _d_pass = IRGAN_Point._d_pass
    _g_pass = IRGAN_Point._g_pass
