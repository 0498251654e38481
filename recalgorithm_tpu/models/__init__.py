"""Model zoo: importing this package populates the registry.

16 reference models + ESMM (listed-but-unimplemented in the reference)
+ beyond-reference additions (DCNv2, AutoInt, DLRM, FinalMLP, MaskNet,
GDCN, SharedBottom, TwoTower retrieval).
Use ``recalgorithm_tpu.models.get_model(name)`` for (config_cls, model_cls).
"""

from recalgorithm_tpu.models.common import MODEL_REGISTRY, get_model, register_model

# import order is alphabetical-ish; each module registers itself
from recalgorithm_tpu.models import (  # noqa: F401
    afm,
    autoint,
    bst,
    dcn,
    dcn_v2,
    deep_crossing,
    deepfm,
    dien,
    din,
    dlrm,
    esmm,
    ffm,
    fibinet,
    final_mlp,
    fwfm,
    gdcn,
    generic_dnn,
    masknet,
    mmoe,
    nfm,
    ple,
    pnn,
    shared_bottom,
    two_tower,
    wide_and_deep,
    xdeepfm,
)

__all__ = ["MODEL_REGISTRY", "get_model", "register_model"]
