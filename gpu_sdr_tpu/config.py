"""Runtime configuration knobs.

Matmul precision: TPU lowers float32 matmuls to bfloat16 passes.  The JAX
defaults to a single bf16 pass, which measures ~49 dB SNR on the DSP chain
— an artificial noise floor a readout instrument cannot accept.  This
framework therefore defaults to 'tensorfloat32' (3 bf16 passes, ~93 dB on
the chain); set GPU_SDR_TPU_MATMUL_PRECISION to 'float32' (6 passes,
~133 dB, half the speed) or 'bfloat16' (fastest, survey-grade only).

Measured on one v5e chip (1000-tone synth+PFB chain, 32x4M scan):
  bfloat16        48.7 dB   5958 Msps
  tensorfloat32   92.8 dB   3407 Msps
  float32        133.3 dB   2009 Msps
"""

from __future__ import annotations

import os

_applied = False
_precision = None


class maybe_profile:
    """Context manager: jax.profiler trace when GPU_SDR_TPU_PROFILE is set
    to a directory (the first-class tracing the reference lacked —
    SURVEY.md section 5)."""

    def __init__(self, tag: str = "run"):
        self.dir = os.environ.get("GPU_SDR_TPU_PROFILE")
        self.tag = tag
        self._cm = None

    def __enter__(self):
        if self.dir:
            import jax
            try:
                self._cm = jax.profiler.trace(
                    os.path.join(self.dir, self.tag))
                self._cm.__enter__()
            except Exception:
                self._cm = None
        return self

    def __exit__(self, *exc):
        if self._cm is not None:
            try:
                self._cm.__exit__(*exc)
            except Exception:
                pass
        return False


def configure_precision(precision: str | None = None, force: bool = False):
    """Set the global matmul precision and enable the persistent
    compilation cache (idempotent unless force=True)."""
    global _applied, _precision
    if _applied and not force:
        return
    import jax
    p = precision or os.environ.get("GPU_SDR_TPU_MATMUL_PRECISION",
                                    "tensorfloat32")
    _precision = p
    try:
        jax.config.update("jax_default_matmul_precision", p)
        cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/gpu_sdr_tpu_jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _applied = True
    except Exception:
        pass


def use_pallas_pfb() -> bool:
    """Whether the engine should use the Pallas fused PFB pre-sum
    (ops/pallas_pfb.py).  GPU_SDR_TPU_PALLAS=1/0 forces it; the default
    ("auto") enables it on TPU backends only — on CPU, Pallas requires
    interpret mode, which is slower than the XLA path."""
    v = os.environ.get("GPU_SDR_TPU_PALLAS", "auto").lower()
    if v in ("0", "off", "false", "no"):
        return False
    if v in ("1", "on", "true", "yes"):
        return True
    try:
        import jax
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def pad_lanes() -> bool:
    """Whether kernel-backed chains should pad their channel axis up to
    the 128-lane hardware granularity (zero-amplitude dummy tones,
    sliced off host-side after fetch).  A sub-128 channel count makes
    every output tile a lane-MASKED HBM write, which caps the write
    stream at ~212 GB/s useful vs 429 GB/s dense (measured,
    tools/perf_c3_ladder.py 2026-08-21: config 3 at C'=100 is write-
    bound at 18.6 Gsps vs 39.3 for the identical kernel at C'=128);
    the padding itself costs nothing extra in HBM because the masked
    write already streams the padded physical tile.
    GPU_SDR_TPU_PAD_LANES=1/0 forces it; default ("auto") enables it on
    TPU backends only (on CPU the padding just multiplies interpret-mode
    compute)."""
    v = os.environ.get("GPU_SDR_TPU_PAD_LANES", "auto").lower()
    if v in ("0", "off", "false", "no"):
        return False
    if v in ("1", "on", "true", "yes"):
        return True
    try:
        import jax
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def matmul_precision() -> str:
    """The framework's resolved matmul precision ('bfloat16' /
    'tensorfloat32' / 'float32' / 'highest')."""
    return _precision or os.environ.get("GPU_SDR_TPU_MATMUL_PRECISION",
                                        "tensorfloat32")


def kernel_dot_precision() -> str:
    """In-kernel dot mode honoring the global precision knob: Mosaic has
    no 3-pass HIGH, so tensorfloat32 maps to the manual bf16 hi/lo split
    and float32/highest to HIGHEST (exact f32 grade)."""
    return ("highest" if matmul_precision() in ("float32", "highest")
            else "tf32")
