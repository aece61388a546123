"""shardmerge_tpu — a TPU-native model-merging framework.

Re-implements the capabilities of 54rt1n/shardmerge (streaming safetensors
shard merging with spectral FFT/SLERP delta blending) as an idiomatic
JAX / XLA / Pallas framework:

- ``shardmerge_tpu.ops``      — jitted merge numerics (FFT blend, exact
  order-statistic selection, masked SLERP) replacing per-op torch CUDA calls.
- ``shardmerge_tpu.io``       — host-side async shard streaming, index
  resolution, and a buffered safetensors writer (zero torch dependency).
- ``shardmerge_tpu.merge``    — merge orchestration engines (Fourier,
  addition, task-addition) mirroring the reference surface.
- ``shardmerge_tpu.models``   — JAX LLM forward passes (Llama/Qwen2 family)
  for the ``generate`` command and benchmark entry points.
- ``shardmerge_tpu.parallel`` — GSPMD mesh utilities and 2-D sharded FFT for
  tensors that do not fit a single chip.

Reference behavior citations use ``<file>:<line>`` pointing into the
upstream repo (54rt1n/shardmerge) for parity checking.
"""

__version__ = "0.1.0"
