"""Adversarial-branch quality experiment (companion of tree/div_quality.py).

Runs the IRGAN/IRFGAN minimax machines on the synthetic LETOR protocol and
reports each player's test nDCG@5 against its untrained self. GAN-LTR
dynamics are noisy by nature (the reference publishes no numbers either) —
the claim this records is that minimax training moves the players WELL
above their random inits on learnable data, i.e. the machines optimize,
not just execute.

Usage: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m tools.ad_quality
"""

from __future__ import annotations


def protocol_data(seed: int, F: int = 32):
    from ptranking_tpu.data.dataset import BucketedDataset, make_synthetic_queries

    mk = lambda n, s: make_synthetic_queries(
        num_queries=n, num_features=F, min_docs=10, max_docs=40, seed=s)
    return (BucketedDataset(mk(96, seed), batch_docs=512),
            BucketedDataset(mk(32, seed + 2000), batch_docs=512))


def run_machine(model_id: str, train_ds, test_ds, seed: int,
                epochs: int = 20, F: int = 32, burn_in: int = 5):
    from ptranking_tpu.adversarial.evaluator import AD_MACHINES
    from ptranking_tpu.models import ScorerConfig
    from ptranking_tpu.train import OptimizerConfig

    sf_para = {"scorer": ScorerConfig(sf_id="pointsf", num_features=F,
                                      num_layers=3, h_dim=64),
               "optimizer": OptimizerConfig(opt="Adam", lr=1e-3)}
    machine = AD_MACHINES[model_id](sf_para=sf_para, ad_para_dict={}, seed=seed)
    machine.fill_global_buffer(train_ds.batches())
    init = {n: float(p.evaluate(test_ds, ks=(5,))["nDCG"][0])
            for n, p in (("G", machine.get_generator()),
                         ("D", machine.get_discriminator()))}
    for _ in range(burn_in):
        machine.burn_in(train_data=list(train_ds.batches()))
    for epoch_k in range(1, epochs + 1):
        machine.mini_max_train(
            train_data=list(train_ds.batches(shuffle=True, epoch=epoch_k)))
    final = {n: float(p.evaluate(test_ds, ks=(5,))["nDCG"][0])
             for n, p in (("G", machine.get_generator()),
                          ("D", machine.get_discriminator()))}
    return init, final


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser("ad_quality")
    p.add_argument("-seeds", default="137,7")
    p.add_argument("-models", default="IRGAN_Point,IRGAN_Pair,IRFGAN_Pair")
    p.add_argument("-epochs", type=int, default=20)
    p.add_argument("-burn_in", type=int, default=5)
    args = p.parse_args(argv)

    rows = []
    for seed in [int(s) for s in args.seeds.split(",")]:
        train_ds, test_ds = protocol_data(seed)
        for model_id in args.models.split(","):
            init, final = run_machine(model_id, train_ds, test_ds, seed,
                                      epochs=args.epochs, burn_in=args.burn_in)
            rows.append((seed, model_id, init, final))
            print(f"seed {seed} {model_id}: "
                  f"G {init['G']:.4f}->{final['G']:.4f}  "
                  f"D {init['D']:.4f}->{final['D']:.4f}", flush=True)
    print("\n| seed | machine | G untrained -> trained | D untrained -> trained |")
    print("|---|---|---|---|")
    for seed, model_id, i, f in rows:
        print(f"| {seed} | {model_id} | {i['G']:.4f} -> {f['G']:.4f} "
              f"| {i['D']:.4f} -> {f['D']:.4f} |")


if __name__ == "__main__":
    main()
