"""CLI alias: `python -m recalgorithm_tpu.cli.generic_dnn` trains GenericDNN.

The schema-driven baseline — trains on any dataset (--dataset wechat|douban).
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="GenericDNN")
