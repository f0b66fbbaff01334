"""Adversarial base: players (G/D) and the minimax machine protocol.

Counterpart of reference ptranking/ltr_adversarial/base/{ad_machine.py,
ad_player.py}. A player is an AdhocRanker-shaped bundle (scorer params +
optimizer + compiled predict); machines own one jitted G-step and one jitted
D-step per bucket shape — the reference's per-query Python loops
(irgan_point.py:116-220) become single batched device steps.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ptranking_tpu.models import ScorerConfig, apply_scorer
from ptranking_tpu.train.optimizer import OptimizerConfig
from ptranking_tpu.train.ranker import AdhocRanker


class AdversarialPlayer(AdhocRanker):
    """G/D are AdhocNeuralRankers in the reference (ad_player.py:6-12); here
    they are AdhocRankers with a score temperature (irgan_point.py:23-33)."""

    def __init__(self, scorer_cfg: ScorerConfig, opt_cfg: Optional[OptimizerConfig] = None,
                 temperature: Optional[float] = None, seed: int = 137):
        # RankMSE is a placeholder loss: players train through machine steps
        super().__init__("RankMSE", scorer_cfg, opt_cfg=opt_cfg, seed=seed)
        self.temperature = temperature

    def predict_scaled(self, params, features, mask):
        scores = apply_scorer(params, self.scorer_cfg, features, mask, training=False)
        if self.temperature is not None and self.temperature != 1.0:
            scores = scores / self.temperature
        return scores


class AdversarialMachine:
    """Abstract minimax trainer (reference ad_machine.py:5-55)."""

    def __init__(self, sf_para: Dict[str, Any], ad_para_dict: Dict[str, Any],
                 mesh=None):
        self.ad_para_dict = ad_para_dict
        # batches per fused device dispatch in the D/G passes (see
        # train/ranker.py scan_step: dispatch latency dominates small steps)
        self.scan_steps = max(int(ad_para_dict.get("scan_steps", 8)), 1)
        self._scan_cache: Dict[int, Any] = {}
        # optional device mesh: DP over the `data` axis for BOTH players.
        # The minimax steps are per-query-batched pure functions, so data
        # parallelism needs no machine-specific code — player params
        # replicate, batch arrays shard over `data`, and XLA inserts the
        # gradient psum from the shardings (same recipe as
        # parallel/train.py; SURVEY §2.10 DP generalises "the per-batch
        # loop", which all branches share)
        self.mesh = mesh
        self._mesh_ready = False

    def _mesh_prepare(self):
        """Replicate both players' state on the mesh (lazy — players are
        built by the subclass ctor; re-run after reset_*)."""
        if self.mesh is None or self._mesh_ready:
            return
        from ptranking_tpu.parallel.mesh import replicated

        rep = replicated(self.mesh)
        for p in (self.generator, self.discriminator):
            p.params = jax.device_put(p.params, rep)
            p.opt_state = jax.device_put(p.opt_state, rep)
        self._mesh_ready = True

    def _mesh_put(self, f, l, m):
        """Shard (possibly K-stacked) batch arrays over the batch axes,
        padding batch rows to the DP degree with all-masked rows (the
        padding-invariance contract every machine step already honours for
        bucketed remainder rows)."""
        import numpy as np
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = ("dcn", "data") if "dcn" in self.mesh.axis_names else "data"
        dp = self.mesh.shape["data"] * (self.mesh.shape["dcn"]
                                        if "dcn" in self.mesh.axis_names else 1)
        f, l, m = np.asarray(f), np.asarray(l), np.asarray(m)
        pb = (-m.shape[-2]) % dp
        if pb:
            f = np.pad(f, [(0, 0)] * (f.ndim - 3) + [(0, pb), (0, 0), (0, 0)])
            l = np.pad(l, [(0, 0)] * (l.ndim - 2) + [(0, pb), (0, 0)])
            m = np.pad(m, [(0, 0)] * (m.ndim - 2) + [(0, pb), (0, 0)])
        lead = (None,) * (f.ndim - 3)
        return (jax.device_put(f, NamedSharding(self.mesh, P(*lead, axes, None, None))),
                jax.device_put(l, NamedSharding(self.mesh, P(*lead, axes, None))),
                jax.device_put(m, NamedSharding(self.mesh, P(*lead, axes, None))))

    def _scan_pass_for(self, step):
        """jit a K-batch scan around a (params, opt_state, other, key, f, l,
        m) player step; cached per step identity."""
        import functools

        cached = self._scan_cache.get(id(step))
        if cached is not None:
            return cached

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def scan_pass(params, opt_state, other, key, f_k, l_k, m_k):
            K = f_k.shape[0]
            keys = jax.random.split(key, K)

            def body(carry, inp):
                params, opt_state = carry
                sub, f, l, m = inp
                params, opt_state, loss = step(params, opt_state, other, sub, f, l, m)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (keys, f_k, l_k, m_k))
            return params, opt_state, jnp.sum(losses)

        self._scan_cache[id(step)] = scan_pass
        return scan_pass

    def _fused_pass(self, step, player, other_params, train_data):
        """Run one pass of `step` over the batches with K-batch scan fusion
        (utils/chunking.py policy); returns True when a chunk loss went
        non-finite (stop signal)."""
        from ptranking_tpu.utils.chunking import iter_shape_chunks

        self._mesh_prepare()
        scan_pass = self._scan_pass_for(step)
        for chunk, fused in iter_shape_chunks(train_data, self.scan_steps):
            self._key, sub = jax.random.split(self._key)
            if fused:
                f = jnp.stack([jnp.asarray(b.features) for b in chunk])
                l = jnp.stack([jnp.asarray(b.labels) for b in chunk])
                m = jnp.stack([jnp.asarray(b.mask) for b in chunk])
                if self.mesh is not None:
                    f, l, m = self._mesh_put(f, l, m)
                player.params, player.opt_state, loss = scan_pass(
                    player.params, player.opt_state, other_params, sub, f, l, m)
            else:
                loss = 0.0
                for b in chunk:
                    self._key, sub = jax.random.split(self._key)
                    f, l, m = (jnp.asarray(b.features), jnp.asarray(b.labels),
                               jnp.asarray(b.mask))
                    if self.mesh is not None:
                        f, l, m = self._mesh_put(f, l, m)
                    player.params, player.opt_state, one = step(
                        player.params, player.opt_state, other_params, sub,
                        f, l, m)
                    loss = loss + one
            if not bool(jnp.isfinite(jnp.asarray(loss))):
                return True
        return False

    def pre_check(self):
        pass

    def burn_in(self, train_data=None):
        pass

    def fill_global_buffer(self, train_data=None):
        pass

    def mini_max_train(self, train_data=None) -> bool:
        raise NotImplementedError

    def reset_generator(self):
        self.generator.init()
        self._mesh_ready = False  # fresh params need re-placement on the mesh

    def reset_discriminator(self):
        self.discriminator.init()
        self._mesh_ready = False

    def reset_generator_discriminator(self):
        self.reset_generator()
        self.reset_discriminator()

    def get_generator(self) -> AdversarialPlayer:
        return self.generator

    def get_discriminator(self) -> AdversarialPlayer:
        return self.discriminator
