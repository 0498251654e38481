"""recalgorithm_tpu: a TPU-native CTR-ranking framework.

A from-scratch JAX/XLA/Pallas/pjit re-design with the capabilities of the
reference RecAlgorithm model zoo (16 CTR ranking models on the WeChat
Channels dataset), and beyond it: explicit feature schema, host-side
vocabulary translation with native C++ TFRecord reader/writer, a
mesh-sharded embedding engine, fused Pallas interaction kernels, a pjit
training loop (streaming AUC/GAUC/logloss/calibration, Orbax checkpointing,
best-export, preemption safety), a retrieval family with exact/int8 top-k,
int8 serving quantization, StableHLO export with hermetic multi-model HTTP
serving, and a flag-compatible CLI per model.  Start at docs/MIGRATION.md.
"""

__version__ = "0.3.0"
