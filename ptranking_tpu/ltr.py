"""CLI entry: python -m ptranking_tpu.ltr -model LambdaRank -data SyntheticMQ ...

Mirrors reference pt_ranking.py:69-87 + ArgsUtil (utils/args/argsUtil.py:11-37):
the model id selects the evaluator — adhoc (LTREvaluator), adversarial
(AdLTREvaluator, pt_ranking.py:75-76), tree (TreeLTREvaluator, :78-79) — and we
additionally wire the diversification evaluator, which the reference leaves
un-dispatched (driven only from testing_ltr_diversification.py; SURVEY §2.3
"phantom models" note).
"""

from __future__ import annotations

import argparse

from ptranking_tpu.adversarial.evaluator import LTR_ADVERSARIAL_MODELS
from ptranking_tpu.diversification.ranker import DIV_MODELS as LTR_DIV_MODELS
from ptranking_tpu.eval import LTR_ADHOC_MODELS, LTREvaluator
from ptranking_tpu.tree.evaluator import LTR_TREE_MODELS
ALL_MODELS = (list(LTR_ADHOC_MODELS) + LTR_ADVERSARIAL_MODELS
              + LTR_TREE_MODELS + LTR_DIV_MODELS)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("ptranking_tpu")
    # reference flags (argsUtil.py:19-29)
    p.add_argument("-cuda", type=int, default=None, help="device ordinal (jax-global; accepted for parity)")
    p.add_argument("-model", type=str, required=True, choices=ALL_MODELS)
    p.add_argument("-debug", action="store_true", help="shrink epochs/folds for a quick check")
    p.add_argument("-dir_json", type=str, default=None, help="dir with Data_Eval_ScoringFunction.json")
    # direct (non-json) configuration
    p.add_argument("-sf_id", type=str, default="pointsf", choices=["pointsf", "listsf"])
    p.add_argument("-data", dest="data_id", type=str, default=None)
    p.add_argument("-dir_data", type=str, default=None)
    p.add_argument("-dir_output", type=str, default="./output")
    p.add_argument("-grid", action="store_true", help="grid search")
    p.add_argument("-reproduce", action="store_true", help="reload fold-optimal checkpoints and re-evaluate")
    p.add_argument("-epochs", type=int, default=None, help="override epoch count (branch evaluators)")
    # mesh-parallel knobs (adhoc branch; TPU runtime, no reference analogue):
    # route the k-fold/grid/reproduce lifecycle through DistributedTrainer
    p.add_argument("-mesh", type=str, default=None,
                   help="mesh axis sizes, e.g. 'data=8' or 'data=4,model=2' "
                        "(axes: data/model/seq/dcn)")
    p.add_argument("-tp", action="store_true", help="tensor-parallel scorer weights over the model axis")
    p.add_argument("-shard_docs", action="store_true", help="context-parallel doc axis over the seq axis")
    p.add_argument("-cp_impl", type=str, default=None, choices=["ring", "ulysses"])
    p.add_argument("-pp_stages", type=int, default=None,
                   help="stage the listsf encoder over the model axis at inference")
    p.add_argument("-scan_steps", type=int, default=None, help="train batches fused per device dispatch")
    p.add_argument("-seed", type=int, default=None,
                   help="base init+shuffle seed (default 137); multi-seed "
                        "bands via tools/real_data_parity.py")
    return p


def parse_mesh_overrides(args) -> dict:
    """-mesh 'data=4,model=2' (+ -tp/-shard_docs/...) -> EvalSetting overrides."""
    ov = {}
    if args.mesh:
        mesh = {}
        for part in args.mesh.split(","):
            ax, _, n = part.partition("=")
            mesh[ax.strip()] = int(n)
        ov["mesh"] = mesh
    if args.tp:
        ov["tp"] = True
    if args.shard_docs:
        ov["shard_docs"] = True
    if args.cp_impl:
        ov["cp_impl"] = args.cp_impl
    if args.pp_stages is not None:
        ov["pp_stages"] = args.pp_stages
    if args.scan_steps is not None:
        ov["scan_steps"] = args.scan_steps
    return ov


def _ensure_cpu_mesh_devices(overrides: dict) -> None:
    """-mesh on a CPU run needs that many virtual host devices, and the flag
    only takes effect BEFORE the first backend touch — and must be set
    in-process (the axon bootstrap rewrites shell-level XLA_FLAGS; see
    tests/conftest.py, which uses the same trick). On real TPU hardware the
    devices already exist and this is a no-op."""
    import os

    mesh = overrides.get("mesh")
    if not mesh or os.environ.get("JAX_PLATFORMS", "") != "cpu":
        return
    need = 1
    for v in mesh.values():
        need *= int(v)
    if need <= 1:
        return
    import jax

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={need}")
    jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    args = build_parser().parse_args(argv)
    _ensure_cpu_mesh_devices(parse_mesh_overrides(args))

    from ptranking_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    if args.model in LTR_ADVERSARIAL_MODELS:
        from ptranking_tpu.adversarial import AdLTREvaluator
        evaluator = AdLTREvaluator(mesh_overrides=parse_mesh_overrides(args))
        if args.dir_json:
            return evaluator.run(debug=args.debug, model_id=args.model,
                                 config_with_json=True, dir_json=args.dir_json)
        if args.grid:
            return evaluator.grid_run(debug=args.debug, model_id=args.model,
                                      data_id=args.data_id or "SyntheticMQ",
                                      dir_data=args.dir_data, dir_output=args.dir_output)
        return evaluator.point_run(
            model_id=args.model, data_id=args.data_id or "SyntheticMQ",
            dir_data=args.dir_data, dir_output=args.dir_output,
            debug=args.debug, epochs=args.epochs,
        )
    if args.model in LTR_TREE_MODELS:
        from ptranking_tpu.tree import TreeLTREvaluator
        evaluator = TreeLTREvaluator()
        if args.dir_json:
            return evaluator.run(debug=args.debug, model_id=args.model,
                                 config_with_json=True, dir_json=args.dir_json)
        if args.grid:
            return evaluator.grid_run(debug=args.debug, model_id=args.model,
                                      data_id=args.data_id or "SyntheticMQ",
                                      dir_data=args.dir_data, dir_output=args.dir_output)
        return evaluator.point_run(
            model_id=args.model, data_id=args.data_id or "SyntheticMQ",
            dir_data=args.dir_data, dir_output=args.dir_output, debug=args.debug,
        )
    if args.model in LTR_DIV_MODELS:
        from ptranking_tpu.diversification import DivLTREvaluator
        evaluator = DivLTREvaluator()
        if args.dir_json:
            return evaluator.run(debug=args.debug, model_id=args.model, sf_id=args.sf_id,
                                 config_with_json=True, dir_json=args.dir_json,
                                 reproduce=args.reproduce)
        if args.grid:
            return evaluator.grid_run(debug=args.debug, model_id=args.model,
                                      sf_id=args.sf_id,
                                      data_id=args.data_id or "SyntheticDiv",
                                      dir_data=args.dir_data, dir_output=args.dir_output)
        return evaluator.point_run(
            model_id=args.model, sf_id=args.sf_id,
            data_id=args.data_id or "SyntheticDiv",
            dir_data=args.dir_data, dir_output=args.dir_output,
            debug=args.debug, epochs=args.epochs, write_run_files=True,
            reproduce=args.reproduce,
            **parse_mesh_overrides(args),  # DivRanker DP when -mesh is given
        )

    adhoc_overrides = parse_mesh_overrides(args)
    if args.seed is not None:
        adhoc_overrides["seed"] = args.seed
    evaluator = LTREvaluator(cuda=args.cuda, mesh_overrides=adhoc_overrides)
    return evaluator.run(
        debug=args.debug, model_id=args.model, sf_id=args.sf_id,
        config_with_json=args.dir_json is not None, dir_json=args.dir_json,
        data_id=args.data_id or "SyntheticMQ", dir_data=args.dir_data,
        dir_output=args.dir_output,
        grid_search=args.grid, reproduce=args.reproduce,
    )


if __name__ == "__main__":
    main()
