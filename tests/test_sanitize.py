"""Numerical sanitizer subsystem (utils/sanitize.py) — the TPU analogue of
the reference's sanitizer tooling (SURVEY §5: asan_suppressions.txt)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stillleben_tpu.utils import sanitize


def test_check_finite_clean():
    tree = {"a": jnp.ones((4, 3)), "b": (jnp.zeros(5), np.arange(3))}
    assert sanitize.check_finite(tree, "clean") == []


def test_check_finite_reports_leaf_paths_and_counts():
    tree = {
        "ok": jnp.ones(4),
        "poisoned": jnp.array([1.0, jnp.nan, jnp.inf, jnp.nan]),
        "ints": jnp.arange(4),  # non-float leaves are skipped
    }
    with pytest.raises(sanitize.NonFiniteError) as ei:
        sanitize.check_finite(tree, "render output")
    err = ei.value
    assert err.name == "render output"
    assert len(err.bad) == 1
    path, n_nan, n_inf = err.bad[0]
    assert "poisoned" in path
    assert (n_nan, n_inf) == (2, 1)
    assert "render output" in str(err) and "2 NaN" in str(err)


def test_check_finite_noraise_returns_offenders():
    bad = sanitize.check_finite(
        {"x": jnp.array([jnp.inf])}, "x", raise_=False
    )
    assert len(bad) == 1 and bad[0][2] == 1


def test_debug_nans_context_restores():
    prev = jax.config.jax_debug_nans
    with sanitize.debug_nans(True):
        assert jax.config.jax_debug_nans is True
        with pytest.raises(FloatingPointError):
            jnp.log(jnp.array(-1.0)) + 0.0  # noqa: B018
    assert jax.config.jax_debug_nans is prev


def test_checked_raises_inside_jit_scan():
    """checkify works where jax_debug_nans cannot: inside lax.scan."""

    def step(x):
        def body(c, _):
            return jnp.sqrt(c - 1.0), None  # NaN once c < 1

        out, _ = jax.lax.scan(body, x, None, length=3)
        return out

    f = sanitize.checked(jax.jit(step))
    assert float(f(jnp.float32(1e6))) > 0  # clean path returns the value
    with pytest.raises(Exception, match="nan"):
        f(jnp.float32(0.5))


def test_enabled_env_knob(monkeypatch):
    monkeypatch.delenv("SL_SANITIZE", raising=False)
    assert not sanitize.enabled()
    monkeypatch.setenv("SL_SANITIZE", "1")
    assert sanitize.enabled()
    monkeypatch.setenv("SL_SANITIZE", "0")
    assert not sanitize.enabled()


def test_render_pass_hook_runs(monkeypatch):
    """SL_SANITIZE=1 audits every RenderPass result (and passes on a clean
    scene)."""
    import stillleben_tpu as sl

    monkeypatch.setenv("SL_SANITIZE", "1")
    calls = []
    orig = sanitize.check_finite

    def spy(tree, name="output", raise_=True):
        calls.append(name)
        return orig(tree, name, raise_=raise_)

    monkeypatch.setattr(sanitize, "check_finite", spy)

    scene = sl.Scene((64, 48))
    mesh = sl.Mesh("primitive://cube")
    scene.add_object(sl.Object(mesh))
    rp = sl.RenderPass(ssao=False)
    res = rp.render(scene)
    assert res.rgb().shape == (48, 64, 4)
    assert any("RenderPass" in c for c in calls)
