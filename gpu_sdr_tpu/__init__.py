"""gpu_sdr_tpu — a TPU-native software-defined-radio readout framework.

A from-scratch re-design of the capabilities of GPU_SDR (a CUDA/C++ real-time
readout system for frequency-multiplexed superconducting resonators) for TPU
hardware: all DSP is expressed as jittable JAX/Pallas functions over static
shapes, streaming state (FIR tails, PFB spare samples, phase indices) is an
explicit scan carry, and channels/time-blocks shard over a `jax.sharding.Mesh`
with ICI collectives for halo exchange.

Layer map (mirrors reference SURVEY.md §1):
  L0  params / utils      — config structs, validation, logging
  L1  engine.sources/sinks— synthetic & replay IQ ingest, HDF5/TCP egress
  L2  ops                 — DDC, FIR, PFB, chirp, lock-in, tone-gen kernels
  L3  engine              — streaming pipeline with scan-carried state
  L4  server              — JSON command protocol + TCP servers
  L5  client              — connections, files (HDF5 schema)
  L6  client (analysis)   — VNA, noise, fitting, delay, full-spec, triggers
  L7  scripts             — measurement workflows
"""

__version__ = "0.1.0"

from . import params  # noqa: F401
