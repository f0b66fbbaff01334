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
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from ptranking_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()

    if args.model in LTR_ADVERSARIAL_MODELS:
        from ptranking_tpu.adversarial import AdLTREvaluator
        evaluator = AdLTREvaluator()
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
        )

    evaluator = LTREvaluator(cuda=args.cuda)
    return evaluator.run(
        debug=args.debug, model_id=args.model, sf_id=args.sf_id,
        config_with_json=args.dir_json is not None, dir_json=args.dir_json,
        data_id=args.data_id or "SyntheticMQ", dir_data=args.dir_data,
        dir_output=args.dir_output,
        grid_search=args.grid, reproduce=args.reproduce,
    )


if __name__ == "__main__":
    main()
