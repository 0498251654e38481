"""recalgorithm_tpu: a TPU-native CTR-ranking framework.

A from-scratch JAX/XLA/Pallas/pjit re-design with the capabilities of the
reference RecAlgorithm model zoo (16 CTR ranking models on the WeChat
Channels dataset): explicit feature schema, host-side vocabulary translation,
a sharded embedding engine, fused interaction kernels, a pjit training loop
with streaming AUC / Orbax checkpointing / best-export, and a flag-compatible
CLI per model.
"""

__version__ = "0.1.0"
