"""Reference-compatible CLI entry point (reference pt_ranking.py:69-87).

Users arriving from wildltr/ptranking can run the exact same command:

    python pt_ranking.py -model ListMLE -dir_json ./configs/
    python pt_ranking.py -cuda 0 -model LambdaRank -data MQ2008_Super ...

This is a thin alias of `python -m ptranking_tpu.ltr` (which also accepts
the adversarial / tree / diversification model ids the reference never
wired into its CLI).
"""

from ptranking_tpu.ltr import main

if __name__ == "__main__":
    main()
