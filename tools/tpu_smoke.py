#!/usr/bin/env python
"""Staged TPU smoke harness: bisect hardware faults by pipeline stage.

Runs a ladder of increasingly complete workloads, each in its OWN subprocess
with its own timeout, printing one line per stage:

    PASS  <stage>  <seconds>s
    FAIL  <stage>  rc=<rc>  <last-error-line>
    TIME  <stage>  (timeout after <budget>s)

Run after every TPU-affecting change (the round-2 failure mode was ten
TPU-targeted commits with zero hardware executions between them). A stage
failing while the previous passes localizes the fault. Usage:

    python tools/tpu_smoke.py            # all stages
    python tools/tpu_smoke.py pallas pbr # just these stages
    SMOKE_TIMEOUT=600 python tools/tpu_smoke.py

The per-stage bodies execute `python -c` so a Mosaic kernel fault (which can
take down the whole process) only kills that stage.
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMEOUT = int(os.environ.get("SMOKE_TIMEOUT", "480"))

# The machine's sitecustomize dials the TPU relay in EVERY python process at
# interpreter start, and two concurrent processes deadlock on the single
# tunnel. The RUNNER never touches the TPU — re-exec it once with the axon
# site stripped so only the one live child stage holds the tunnel. Children
# get the ORIGINAL environment (they need the TPU).
_RUNNER_MARKER = "_SL_SMOKE_RUNNER"
if os.environ.get(_RUNNER_MARKER) != "1":
    env = dict(os.environ)
    env[_RUNNER_MARKER] = "1"
    env["_SL_SMOKE_CHILD_PYTHONPATH"] = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable, "-u"] + sys.argv, env)

_CHILD_ENV = dict(os.environ)
_CHILD_ENV["PYTHONPATH"] = os.environ.get("_SL_SMOKE_CHILD_PYTHONPATH", "")
_CHILD_ENV.pop("JAX_PLATFORMS", None)
_CHILD_ENV.pop(_RUNNER_MARKER, None)

PRELUDE = """
import os, time, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_compilation_cache_dir', os.path.join({repo!r}, '.jax_cache'))
import jax.numpy as jnp
t0 = time.time()
"""

STAGES = [
    (
        "matmul",
        """
x = jnp.ones((512, 512), jnp.bfloat16)
y = (x @ x).sum()
jax.block_until_ready(y)
print('matmul ok', float(y))
""",
    ),
    (
        "pallas_min",
        """
from jax.experimental import pallas as pl
def k(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0
x = jnp.ones((8, 128), jnp.float32)
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
jax.block_until_ready(y)
print('pallas_min ok', float(y.sum()))
""",
    ),
    (
        "fine_raster",
        """
import numpy as np
from stillleben_tpu.ops.fine_raster import fine_raster_pallas, FIELDS
rng = np.random.default_rng(0)
for tile in (16, 64):
    G = jnp.asarray(rng.normal(size=(4, 2, FIELDS, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(-1, 50, size=(4, 2, 128)).astype(np.int32))
    md = jnp.zeros((4, tile * tile), jnp.float32)
    w, t = fine_raster_pallas(G, ids, md, 0.1, 10.0, 128, 2, tile=tile)
    jax.block_until_ready((w, t))
    print('fine_raster ok tile', tile)
""",
    ),
    (
        # the bench renders under vmap (render_sub_batch): vmap batches every
        # pallas_call operand, incl. the SMEM occupancy row — a layout that
        # only works unbatched has slipped through smoke before (r3)
        "fine_raster_vmap",
        """
import numpy as np
from stillleben_tpu.ops.fine_raster import fine_raster_pallas, FIELDS
rng = np.random.default_rng(0)
for tpg in (1, 4):
    G = jnp.asarray(rng.normal(size=(3, 4, 2, FIELDS, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(-1, 50, size=(3, 4, 2, 128)).astype(np.int32))
    md = jnp.zeros((3, 4, 256), jnp.float32)
    f = lambda g, i, m: fine_raster_pallas(
        g, i, m, 0.1, 10.0, 128, 2, tile=16, tiles_per_cell=tpg)
    w, t = jax.vmap(f)(G, ids, md)
    jax.block_until_ready((w, t))
    print('fine_raster_vmap ok tpg', tpg)
""",
    ),
    (
        "flat_render",
        """
import stillleben_tpu as sl
sl.init()
scene = sl.Scene((64, 64)); scene.seed(0)
cube = sl.Mesh('primitive://cube'); cube.scale_to_bbox_diagonal(0.2)
for _ in range(2):
    scene.add_object(sl.Object(cube))
from stillleben_tpu.parallel.batch import template_from_scene, generate_one
from stillleben_tpu.physics.types import default_config
from stillleben_tpu.render.frame import FrameConfig
tpl = template_from_scene(scene)
cfg = FrameConfig(width=64, height=64, shading='flat', ssao=False,
                  shadow_mode='off', chunk=64)
out = jax.jit(lambda k: generate_one(k, tpl, cfg, default_config(),
                                     settle_iterations=2))(jax.random.PRNGKey(0))
jax.block_until_ready(out.rgb)
print('flat_render ok', int(out.instance_index.max()))
""",
    ),
    (
        "pbr_noshadow",
        """
import stillleben_tpu as sl
sl.init()
scene = sl.Scene((128, 128)); scene.seed(0)
cube = sl.Mesh('primitive://cube'); cube.scale_to_bbox_diagonal(0.2)
for _ in range(2):
    scene.add_object(sl.Object(cube))
from stillleben_tpu.parallel.batch import template_from_scene, generate_one
from stillleben_tpu.physics.types import default_config
from stillleben_tpu.render.frame import FrameConfig
tpl = template_from_scene(scene)
cfg = FrameConfig(width=128, height=128, shading='pbr', ssao=False,
                  shadow_mode='off', max_lights=1, chunk=64)
out = jax.jit(lambda k: generate_one(k, tpl, cfg, default_config(),
                                     settle_iterations=2))(jax.random.PRNGKey(0))
jax.block_until_ready(out.rgb)
print('pbr_noshadow ok')
""",
    ),
    (
        "pbr_vsm",
        """
import stillleben_tpu as sl
sl.init()
scene = sl.Scene((128, 128)); scene.seed(0)
cube = sl.Mesh('primitive://cube'); cube.scale_to_bbox_diagonal(0.2)
for _ in range(2):
    scene.add_object(sl.Object(cube))
from stillleben_tpu.parallel.batch import template_from_scene, generate_one
from stillleben_tpu.physics.types import default_config
from stillleben_tpu.render.frame import FrameConfig
tpl = template_from_scene(scene)
cfg = FrameConfig(width=128, height=128, shading='pbr', ssao=False,
                  shadow_mode='vsm', shadow_size=512, max_lights=1, chunk=64)
out = jax.jit(lambda k: generate_one(k, tpl, cfg, default_config(),
                                     settle_iterations=2))(jax.random.PRNGKey(0))
jax.block_until_ready(out.rgb)
print('pbr_vsm ok')
""",
    ),
    (
        "shadow2048",
        """
import stillleben_tpu as sl
sl.init()
scene = sl.Scene((128, 128)); scene.seed(0)
cube = sl.Mesh('primitive://cube'); cube.scale_to_bbox_diagonal(0.2)
for _ in range(2):
    scene.add_object(sl.Object(cube))
from stillleben_tpu.parallel.batch import template_from_scene, generate_one
from stillleben_tpu.physics.types import default_config
from stillleben_tpu.render.frame import FrameConfig
tpl = template_from_scene(scene)
cfg = FrameConfig(width=128, height=128, shading='pbr', ssao=False,
                  shadow_mode='vsm', shadow_size=2048, max_lights=1, chunk=64)
out = jax.jit(lambda k: generate_one(k, tpl, cfg, default_config(),
                                     settle_iterations=2))(jax.random.PRNGKey(0))
jax.block_until_ready(out.rgb)
print('shadow2048 ok')
""",
    ),
    (
        "fine_raster_tpg",
        """
import numpy as np
from stillleben_tpu.ops.fine_raster import fine_raster_pallas, FIELDS
rng = np.random.default_rng(0)
G = jnp.asarray(rng.normal(size=(12, 2, FIELDS, 128)).astype(np.float32))
ids = jnp.asarray(rng.integers(-1, 50, size=(12, 2, 128)).astype(np.int32))
md = jnp.zeros((12, 256), jnp.float32)
w1, t1 = fine_raster_pallas(G, ids, md, 0.1, 10.0, 128, 4)
for tpg in (4, 8):
    wg, tg = fine_raster_pallas(G, ids, md, 0.1, 10.0, 128, 4,
                                tiles_per_cell=tpg)
    assert (np.asarray(wg) == np.asarray(w1)).all(), f'tpg={tpg} w mismatch'
    assert (np.asarray(tg) == np.asarray(t1)).all(), f'tpg={tpg} t mismatch'
print('fine_raster_tpg ok')
""",
    ),
    (
        "settle_stack",
        """
import numpy as np
import stillleben_tpu as sl
sl.init()
scene = sl.Scene((64, 64)); scene.seed(0)
cube = sl.Mesh('primitive://cube'); cube.scale_to_bbox_diagonal(0.2)
sph = sl.Mesh('primitive://sphere'); sph.scale_to_bbox_diagonal(0.25)
for m in (cube, sph, cube, sph):
    scene.add_object(sl.Object(m))
scene.simulate_tabletop_scene()
for o in scene.objects:
    z = np.asarray(o.pose())[2, 3]
    assert z > -0.05, f'body below floor: {z}'
print('settle_stack ok')
""",
    ),
    (
        "bench_small",
        """
import os, runpy
os.environ.setdefault('BENCH_BATCH', '4')
os.environ.setdefault('BENCH_REPEATS', '1')
os.environ.setdefault('BENCH_RENDER_SUB', '2')
sys.argv = ['bench.py']
runpy.run_path(os.path.join({repo!r}, 'bench.py'), run_name='__main__')
""",
    ),
]


def run_stage(name: str, body: str) -> bool:
    code = PRELUDE.format(repo=REPO) + body.replace("{repo!r}", repr(REPO))
    t0 = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-u", "-c", code],
            capture_output=True,
            text=True,
            timeout=TIMEOUT,
            cwd=REPO,
            env=_CHILD_ENV,
        )
    except subprocess.TimeoutExpired:
        print(f"TIME  {name}  (timeout after {TIMEOUT}s)", flush=True)
        return False
    dt = time.time() - t0
    if proc.returncode == 0:
        print(f"PASS  {name}  {dt:.1f}s", flush=True)
        return True
    err_lines = [l for l in proc.stderr.splitlines() if l.strip()]
    tail = err_lines[-1][:160] if err_lines else ""
    print(f"FAIL  {name}  rc={proc.returncode}  {tail}", flush=True)
    return False


def run_one_process(wanted):
    """All stages inside ONE subprocess: pays the TPU attach once (attach
    through the relay costs seconds-to-minutes, and is worst right after a
    previous TPU process died uncleanly). A hard kernel fault still poisons
    the rest of the ladder — use the default per-stage subprocess mode to
    bisect one. Per-stage wall budget via SIGALRM, clean exit either way."""
    bodies = [
        (name, body) for name, body in STAGES if not wanted or name in wanted
    ]
    script = PRELUDE.format(repo=REPO) + """
import signal, traceback
def _alarm(s, f):
    raise TimeoutError('stage budget exceeded')
signal.signal(signal.SIGALRM, _alarm)
any_fail = False
"""
    for name, body in bodies:
        indented = "\n".join(
            "    " + l for l in body.replace("{repo!r}", repr(REPO)).strip().splitlines()
        )
        script += f"""
t0 = time.time()
signal.alarm({TIMEOUT})
try:
{indented}
    print(f'PASS  {name}  {{time.time()-t0:.1f}}s', flush=True)
except Exception as e:
    any_fail = True
    print(f'FAIL  {name}  {{type(e).__name__}}: {{str(e)[:160]}}', flush=True)
finally:
    signal.alarm(0)
"""
    script += "\nsys.exit(1 if any_fail else 0)\n"
    proc = subprocess.run(
        [sys.executable, "-u", "-c", script], cwd=REPO, env=_CHILD_ENV
    )
    sys.exit(proc.returncode)


def main():
    args = sys.argv[1:]
    one_process = "--one-process" in args
    wanted = {a for a in args if not a.startswith("-")}
    if one_process:
        run_one_process(wanted)
        return
    any_fail = False
    for name, body in STAGES:
        if wanted and name not in wanted:
            continue
        ok = run_stage(name, body)
        any_fail = any_fail or not ok
    sys.exit(1 if any_fail else 0)


if __name__ == "__main__":
    main()
