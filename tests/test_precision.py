"""bfloat16 precision envelope (BASELINE.md "bf16 quality" caveat).

Pins down WHERE bf16 compute is quality-safe instead of leaving it as a
prose note. Protocol: run the production 64-channel HRNet under f32 and
bf16 compute with identical f32 params, map both outputs through the same
affine normalization into [0.1, 0.9], then synthesize ground truth at a
controlled quality level (hr = sr_f32 + gaussian noise at the target
PSNR). The bf16-vs-f32 cPSNR delta is then a pure function of the bf16
rounding error relative to the target noise floor:

  - at <= 30 dB output quality the delta is inside the 0.01 dB parity
    budget -> bf16 is safe for training-time monitoring;
  - at ~50 dB (competition-grade scores) it reaches ~0.5 dB -> final
    scoring and the benchmark headline must stay f32 (and do: the
    evaluator builds an f32 model unless bf16 is explicitly configured).

The reference has no analogous guard: it is fp32-only (src/train.py:141).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from highresnet_tpu.config import DEFAULT_CONFIG
from highresnet_tpu.models.hrnet import HRNet
from highresnet_tpu.ops.metrics import cpsnr


@pytest.fixture(scope="module")
def forwards():
    rng = np.random.default_rng(0)
    lrs = jnp.asarray(rng.random((2, 4, 16, 16)), jnp.float32)
    alphas = jnp.ones((2, 4), jnp.float32)
    f32 = HRNet(config=DEFAULT_CONFIG["network"], dtype=jnp.float32)
    bf16 = HRNet(config=DEFAULT_CONFIG["network"], dtype=jnp.bfloat16)
    params = jax.jit(f32.init)(jax.random.PRNGKey(0), lrs, alphas)["params"]
    sr32 = np.asarray(jax.jit(lambda p, x, a: f32.apply({"params": p}, x, a))(params, lrs, alphas))
    sr16 = np.asarray(jax.jit(lambda p, x, a: bf16.apply({"params": p}, x, a))(params, lrs, alphas))
    # identical affine map into [0.1, 0.9]: cPSNR needs [0,1]-range images
    # and clipping would corrupt the controlled noise floor
    lo, hi = sr32.min(), sr32.max()
    norm = lambda z: (z - lo) / (hi - lo) * 0.8 + 0.1
    return norm(sr32), norm(sr16)


def _delta_db_at(sr32, sr16, target_db, seed=1):
    """(|cPSNR(bf16) - cPSNR(f32)|, achieved f32 dB) at an operating point."""
    rng = np.random.default_rng(seed)
    noise = rng.normal(scale=10 ** (-target_db / 20.0), size=sr32.shape)
    hr = jnp.asarray(sr32 + noise, jnp.float32)
    ones = jnp.ones(hr.shape, jnp.float32)
    p32 = np.asarray(cpsnr(jnp.asarray(sr32), hr, ones))
    p16 = np.asarray(cpsnr(jnp.asarray(sr16), hr, ones))
    return float(np.max(np.abs(p32 - p16))), float(np.mean(p32))


def test_bf16_pixel_deviation_small(forwards):
    sr32, sr16 = forwards
    err = sr32 - sr16
    # bf16 keeps ~8 significand bits; through the conv stack the rounding
    # error stays at the 1e-3 scale (rms) on unit-range outputs
    assert float(np.sqrt(np.mean(np.square(err)))) < 3e-3
    assert float(np.max(np.abs(err))) < 1.5e-2


def test_bf16_safe_at_moderate_quality(forwards):
    """At <= 30 dB output quality the delta is inside the 0.01 dB budget."""
    sr32, sr16 = forwards
    for target in (25.0, 30.0):
        delta, achieved = _delta_db_at(sr32, sr16, target)
        assert abs(achieved - target) < 1.5  # operating point sanity
        assert delta < 0.01, f"bf16 delta {delta} dB at {achieved:.1f} dB"


def test_bf16_envelope_documented_at_50db(forwards):
    """At ~50 dB (competition-grade cPSNR) the bf16 delta is ~0.5 dB — two
    orders over budget. This is WHY the headline benchmark and the scoring
    path stay f32. Bounded so a metric-precision regression still fails."""
    sr32, sr16 = forwards
    delta, achieved = _delta_db_at(sr32, sr16, 50.0)
    assert abs(achieved - 50.0) < 1.5
    assert 0.01 < delta < 1.5, f"bf16 delta {delta} dB at {achieved:.1f} dB"


def test_scoring_path_is_f32():
    """The evaluator builds an f32 model unless bf16 is explicitly opted
    into — the quality contract rides on this default."""
    import copy
    import inspect

    from highresnet_tpu.eval.evaluator import load_model

    cfg = copy.deepcopy(DEFAULT_CONFIG)
    assert cfg["training"]["compute_dtype"] == "float32"
    src = inspect.getsource(load_model)
    # dtype comes from the config's compute_dtype through the shared
    # resolver, whose default is (f32, f32) — bf16 is explicit opt-in only
    assert "resolve_compute_dtypes" in src and "compute_dtype" in src
    from highresnet_tpu.models.hrnet import resolve_compute_dtypes

    assert resolve_compute_dtypes(cfg["training"]["compute_dtype"]) == (
        jnp.float32,
        jnp.float32,
    )


def test_mixed_recipe_reduces_bf16_error():
    """compute_dtype="mixed" (bf16 body + f32 decoder) strictly reduces the
    output deviation vs full bf16, and resolve_compute_dtypes maps the
    config strings; a single input-side bf16 rounding alone already busts
    the 0.01 dB budget at 50 dB (why no island recipe is scoring-grade —
    PRECISION_ABLATION.json)."""
    from highresnet_tpu.models.hrnet import resolve_compute_dtypes
    from highresnet_tpu.ops.metrics import cpsnr as _cpsnr

    assert resolve_compute_dtypes(None) == (jnp.float32, jnp.float32)
    assert resolve_compute_dtypes("float32") == (jnp.float32, jnp.float32)
    assert resolve_compute_dtypes("bfloat16") == (jnp.bfloat16, jnp.bfloat16)
    assert resolve_compute_dtypes("mixed") == (jnp.bfloat16, jnp.float32)
    with pytest.raises(ValueError, match="compute_dtype"):
        resolve_compute_dtypes("fp8")

    rng = np.random.default_rng(0)
    lrs = jnp.asarray(rng.random((2, 8, 16, 16)), jnp.float32)
    alphas = jnp.ones((2, 8), jnp.float32)
    f32 = HRNet(config=DEFAULT_CONFIG["network"], dtype=jnp.float32)
    params = jax.jit(f32.init)(jax.random.PRNGKey(0), lrs, alphas)["params"]

    def fwd(model, x=lrs):
        return np.asarray(
            jax.jit(lambda p, x, a: model.apply({"params": p}, x, a))(params, x, alphas)
        )

    sr32 = fwd(f32)
    sr16 = fwd(HRNet(config=DEFAULT_CONFIG["network"], dtype=jnp.bfloat16))
    srmx = fwd(HRNet(config=DEFAULT_CONFIG["network"], dtype=jnp.bfloat16,
                     decoder_dtype=jnp.float32))
    rms = lambda a: float(np.sqrt(np.mean((a - sr32) ** 2)))
    assert rms(srmx) < rms(sr16), (rms(srmx), rms(sr16))

    # impossibility pin: ONE bf16 rounding (inputs), f32 everywhere after,
    # still exceeds the 0.01 dB parity budget at a 50 dB operating point
    srq = fwd(f32, lrs.astype(jnp.bfloat16).astype(jnp.float32))
    lo, hi = sr32.min(), sr32.max()
    norm = lambda z: (z - lo) / (hi - lo) * 0.8 + 0.1
    noise = np.random.default_rng(1).normal(scale=10 ** (-50.0 / 20.0), size=sr32.shape)
    hr = jnp.asarray(norm(sr32) + noise, jnp.float32)
    ones = jnp.ones(hr.shape, jnp.float32)
    d = np.max(np.abs(np.asarray(_cpsnr(jnp.asarray(norm(sr32)), hr, ones))
                      - np.asarray(_cpsnr(jnp.asarray(norm(srq)), hr, ones))))
    assert d > 0.01, f"single-rounding floor {d} dB should exceed the parity budget"
