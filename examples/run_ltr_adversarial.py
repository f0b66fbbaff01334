"""Adversarial LTR driver — counterpart of reference testing/ltr_adversarial/
testing_ltr_adversarial.py."""

from ptranking_tpu.adversarial import AdLTREvaluator

debug = True
data_id = "SyntheticMQ"
dir_data = None
models_to_run = ["IRGAN_Point", "IRFGAN_Point"]

if __name__ == "__main__":
    for model_id in models_to_run:
        AdLTREvaluator().run(model_id=model_id, data_id=data_id,
                             dir_data=dir_data, debug=debug,
                             dir_output="./ad_output/")
