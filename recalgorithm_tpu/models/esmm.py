"""ESMM: Entire Space Multi-task Model (CTR + CTCVR over the full space).

The reference README lists ESMM in its model table but ships no
implementation (reference README.md:41,46 — noted "static-graph-only and
unevaluated"; no algorithm/ESMM/ directory exists).  This is a working
implementation mapped onto the WeChat labels:

  * pCTR  = P(read_comment)                      — the "click" tower,
  * pCVR  = P(post_action | read_comment)        — the conditional tower,
  * pCTCVR = pCTR * pCVR = P(read_comment & post_action), trained over the
    entire space against the joint label, eliminating sample-selection bias
    (Ma et al., SIGIR'18).

Both towers share one embedding collection (the paper's key structural
element).  To fit the framework's uniform "logits -> sigmoid CE" loss, the
CTCVR head returns log-odds of the product probability:
logit(pCTR * pCVR) — identical gradient signal to CE on the product.
Tasks emitted: 'read_comment' (CTR) and '<cvr_label>' (CTCVR vs the joint
label, supplied by the data layer as label key ``ctcvr``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from recalgorithm_tpu.features.schema import Schema
from recalgorithm_tpu.models import common
from recalgorithm_tpu.models.dcn import WD_FIELDS
from recalgorithm_tpu.ops.mlp import MLPTower


@dataclasses.dataclass(frozen=True)
class ESMMConfig(common.TrainFlags):
    hidden_units: tuple[int, ...] = (512, 256, 128)
    batch_norm: bool = True
    dropout_rate: float = 0.1
    cvr_label: str = "like"  # the post-click action defining CVR
    task_names: tuple[str, ...] = ("read_comment", "ctcvr")


class ESMM(nn.Module):
    config: ESMMConfig
    schema: Schema

    @nn.compact
    def __call__(self, batch, train: bool = False) -> dict[str, jax.Array]:
        cfg = self.config
        embedder = common.FieldEmbedder(
            tables=common.wd_tables(self.schema), fields=WD_FIELDS
        )
        x = jnp.concatenate([batch["dense"]] + embedder(batch), axis=-1)
        ctr_logit = MLPTower(
            cfg.hidden_units, dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm, logits_dim=1,
            compute_dtype=cfg.compute_dtype, name="ctr_tower",
        )(x, train)[:, 0]
        cvr_logit = MLPTower(
            cfg.hidden_units, dropout_rate=cfg.dropout_rate,
            batch_norm=cfg.batch_norm, logits_dim=1,
            compute_dtype=cfg.compute_dtype, name="cvr_tower",
        )(x, train)[:, 0]
        # logit of the product probability, numerically stable:
        # log(p1*p2) - log(1 - p1*p2) via log-sigmoids.
        log_p = jax.nn.log_sigmoid(ctr_logit) + jax.nn.log_sigmoid(cvr_logit)
        p = jnp.exp(log_p)
        ctcvr_logit = log_p - jnp.log1p(-jnp.clip(p, 0.0, 1.0 - 1e-7))
        return {"read_comment": ctr_logit, "ctcvr": ctcvr_logit}

    def derived_label(self, task: str, batch) -> jax.Array:
        """ctcvr label = read_comment AND cvr_label (entire-space joint label)."""
        if task != "ctcvr":
            raise KeyError(task)
        idx = {n: i for i, n in enumerate(self.schema.labels)}
        return (
            batch["labels"][:, idx["read_comment"]]
            * batch["labels"][:, idx[self.config.cvr_label]]
        )


common.register_model("ESMM", ESMMConfig, ESMM)
