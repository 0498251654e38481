"""CLI alias: `python -m recalgorithm_tpu.cli.gdcn` trains GDCN
(Gated Deep & Cross Network, CIKM'23; beyond reference).
"""

from recalgorithm_tpu.cli.main import main

if __name__ == "__main__":
    main(model_name="GDCN")
