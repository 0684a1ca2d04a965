#!/usr/bin/env python
"""Benchmark: YCB-style tabletop datagen throughput (settle + render + GT).

Measures scenes/sec/chip for the BASELINE.json north-star config 3: 10-object
textured tabletop arrange+settle (the reference's fixed 100x4-substep budget,
src/scene.cpp:612-759) plus a full 640x480 PBR render with IBL light map,
SSAO, textured background plane, and all GT buffers — the same pipeline as
the reference's examples/ycb.py:34-84.

Workload (BENCH_WORKLOAD env):
  "textured"   (default) 3 Stanford-bunny instances (textured, ~69k tris
               each) + 7 primitives, IBL light map, textured background
               plane, SSAO, randomized metallic/roughness — the honest
               config-3 analogue.
  "primitives" the round-1 10-primitive untextured workload (upper bound,
               kept for comparison).

Robustness: each configuration attempt runs under a wall-clock watchdog
(SIGALRM) and an exception guard; on failure the bench DEGRADES (no Pallas
kernel -> no shadows/SSAO -> primitives workload) instead of recording
nothing. The JSON line's "config" field says which rung produced the number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is measured against the 500 scenes/sec/chip target from
BASELINE.json (the reference repo publishes no numbers of its own).
"""

import json
import os
import signal
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

import jax
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
)

TARGET_SCENES_PER_SEC = 500.0  # BASELINE.json north-star target
WIDTH, HEIGHT = 640, 480
N_OBJECTS = 10
BATCH = int(os.environ.get("BENCH_BATCH", "32"))
REPEATS = int(os.environ.get("BENCH_REPEATS", "2"))
WORKLOAD = os.environ.get("BENCH_WORKLOAD", "textured")
WARM_BUDGET = int(os.environ.get("BENCH_WARM_BUDGET", "560"))  # s per attempt
# (observed full-rung cold compile: ~430 s on the v5e relay — a 420 s budget
# fired the watchdog inside the compile-cache write and lost the entry)
BUNNY = "/root/reference/tests/stanford_bunny/scene.gltf"


def _checker_texture(size=512, tiles=8):
    """Procedural uint8 board texture for the background plane."""
    t = size // tiles
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    board = ((yy // t + xx // t) % 2).astype(np.float32)
    rgb = (120 + 90 * board).astype(np.uint8)
    tex = np.stack([rgb, rgb // 2 + 60, np.full_like(rgb, 90), np.full_like(rgb, 255)], -1)
    return tex


def _sky_equirect(h=64, w=128):
    """Synthetic HDR sky: blue gradient + warm sun blob (exercises the full
    IBL precompute + per-pixel IBL shading/skybox path)."""
    v = np.linspace(0, np.pi, h, dtype=np.float32)[:, None]
    u = np.linspace(0, 2 * np.pi, w, dtype=np.float32)[None, :]
    sky = np.stack(
        [
            0.4 + 0.2 * np.cos(v) + 0 * u,
            0.5 + 0.3 * np.cos(v) + 0 * u,
            0.9 + 0.1 * np.cos(v) + 0 * u,
        ],
        -1,
    )
    sun = 40.0 * np.exp(-(((v - 0.9) / 0.08) ** 2 + ((u - 2.0) / 0.08) ** 2))
    sky[..., 0] += sun
    sky[..., 1] += 0.9 * sun
    sky[..., 2] += 0.7 * sun
    return sky.astype(np.float32)


def build_template(workload):
    import stillleben_tpu as sl
    from stillleben_tpu.parallel.batch import template_from_scene
    from stillleben_tpu.render.light_map import LightMap

    sl.init()
    scene = sl.Scene((WIDTH, HEIGHT))
    scene.seed(0)
    rng = np.random.default_rng(7)

    cube = sl.Mesh("primitive://cube")
    cube.scale_to_bbox_diagonal(0.2)
    sphere = sl.Mesh("primitive://sphere")
    sphere.scale_to_bbox_diagonal(0.15)

    if workload == "textured":
        bunny = sl.Mesh(BUNNY)
        bunny.center_bbox()
        bunny.scale_to_bbox_diagonal(0.25)
        order = [bunny, cube, sphere, bunny, cube, sphere, bunny, cube, sphere, cube]
        meshes = [bunny, cube, sphere]
    else:
        order = [cube, sphere] * (N_OBJECTS // 2)
        meshes = [cube, sphere]
    for i, m in enumerate(meshes):
        m.class_index = i + 1

    for m in order[:N_OBJECTS]:
        o = sl.Object(m)
        # reference examples/ycb.py:55-57 randomizes the PBR overrides
        o.metallic = float(rng.random())
        o.roughness = float(rng.random())
        scene.add_object(o)

    if workload == "textured":
        sun_dir = np.array([0.3, 0.5, -0.8], np.float32)
        sun_dir /= np.linalg.norm(sun_dir)
        lights = [(sun_dir, np.array([3.0, 2.8, 2.5], np.float32))]
        # reference default is NumLights=3 (common.h:17) with a shadow pass
        # per active light; the default bench .ibl carries one sun (typical
        # for YCB sIBL files) — BENCH_LIGHTS=3 measures the full-cost config
        for extra in range(int(os.environ.get("BENCH_LIGHTS", "1")) - 1):
            d = np.array([-0.5 + 0.2 * extra, -0.3, -0.9], np.float32)
            d /= np.linalg.norm(d)
            lights.append((d, np.array([1.5, 1.5, 1.6], np.float32)))
        scene.light_map = LightMap.from_equirect(_sky_equirect(), lights=lights)
        scene.background_plane_size = [3.0, 3.0]
        scene.background_plane_texture = sl.Texture2D(_checker_texture())

    return template_from_scene(scene)


class _Watchdog(Exception):
    pass


def _alarm(_sig, _frm):
    raise _Watchdog()


def _attempt(label, tpl, cfg, solver_cfg, batch, sub):
    """Compile + warm + time one configuration; returns scenes/s or raises."""
    from stillleben_tpu.parallel.batch import generate_batch

    keys = jax.random.split(jax.random.PRNGKey(42), batch)

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(WARM_BUDGET)
    try:
        t0 = time.perf_counter()
        out = generate_batch(keys, tpl, cfg, solver_cfg, render_sub_batch=sub)
        jax.block_until_ready(out.rgb)
        warm = time.perf_counter() - t0
        print(f"bench[{label}]: compile+warm {warm:.1f}s", file=sys.stderr, flush=True)
        # content guard: a constant image (all-white exposure blowup from NaN
        # poses, or all-black) means the measurement is of a broken pipeline —
        # fail the rung instead of recording a meaningless rate
        rgb0 = np.asarray(out.rgb[0])[..., :3].astype(np.float32)
        if float(rgb0.std()) < 1.0:
            raise RuntimeError(
                f"degenerate output: constant image (mean {rgb0.mean():.1f})"
            )
    finally:
        signal.alarm(0)

    times = []
    for r in range(REPEATS):
        keys = jax.random.split(jax.random.PRNGKey(100 + r), batch)
        signal.alarm(WARM_BUDGET)
        try:
            t0 = time.perf_counter()
            out = generate_batch(keys, tpl, cfg, solver_cfg, render_sub_batch=sub)
            jax.block_until_ready(out.rgb)
            times.append(time.perf_counter() - t0)
        finally:
            signal.alarm(0)
        print(
            f"bench[{label}]: repeat {r} {times[-1]:.2f}s "
            f"({batch / times[-1]:.2f} scenes/s)",
            file=sys.stderr,
            flush=True,
        )
    return batch / min(times), warm


# degradation ladder: each rung strips the component most likely to have
# broken (Pallas kernel -> shadow/SSAO -> textured workload itself), so a
# fault degrades the number instead of zeroing the round's data point.
# Rungs run in SEPARATE subprocesses: a hard device fault poisons the whole
# PJRT client (observed: even jnp.asarray raises afterwards), so in-process
# degradation cannot work.
RUNGS = [
    # rung 0 applies TUNED.json (written by tools/tpu_tune.py when a sweep
    # finds a config beating baseline) — env-only knobs, same honest
    # workload. Skipped silently when the file doesn't exist.
    (WORKLOAD, "tuned", dict()),
    (WORKLOAD, "full", dict()),
    # XLA-fallback fine stage materializes (C*5, PIX) edge tensors per
    # tile: at 2048^2 shadows that is a ~10 GB/scene transient (observed
    # 20 GB OOM) — this rung caps the shadow map at 512^2
    (WORKLOAD, "no_pallas", dict(use_pallas=False, shadow_size=512)),
    (WORKLOAD, "no_shadow_ssao", dict(shadow_mode="off", ssao=False)),
    ("primitives", "primitives_no_shadow", dict(shadow_mode="off", ssao=False)),
    # last resort when the TPU relay tunnel itself is unreachable (observed:
    # the host-side relay process dying wedges every attach): a CPU-backend
    # measurement, loudly labeled — NOT comparable to the per-chip numbers
    ("primitives", "cpu_fallback_not_tpu", dict(shadow_mode="off", ssao=False)),
]


def run_rung(idx: int) -> None:
    """Child process: run ONE ladder rung on the device and print the JSON
    line on success. Watchdogs are in-process SIGALRM so the process always
    EXITS CLEANLY — an external SIGKILL leaves a dangling relay session that
    wedges the next TPU attach for many minutes."""
    from stillleben_tpu.physics.types import default_config
    from stillleben_tpu.render.frame import FrameConfig

    workload, label, over = RUNGS[idx]
    refmode = os.environ.get("BENCH_REFMODE", "0") == "1"
    if refmode:
        # reference-default quality config (VERDICT r4 item 7): PCF 4x4
        # shadows (render_shader.frag:313-370), exact 64-sample SSAO
        # (ssao_shader.frag:13-57), 3 shadow lights (common.h:17), f32
        # textures, full-rate substep narrowphase with the 256-pair budget —
        # no TUNED.json knobs. Reported as its own JSON line so tuned-mode
        # quality deltas are never silent.
        label = "refmode"
        os.environ.update({
            "BENCH_CONTACT_GEN": "substep",
            "BENCH_NARROW_PAIRS": "256",
            "SL_VSM_TAPS": "4",
            "SL_IBL_PREFILTER": "trilinear",
            "SL_TEX_DTYPE": "f32",
            "BENCH_LIGHTS": "3",
        })
    if label == "tuned":
        # measured-winner env from tools/tpu_tune.py; no file = skip rung
        tuned_path = os.path.join(_REPO, "TUNED.json")
        if not os.path.exists(tuned_path):
            sys.exit(4)
        with open(tuned_path) as f:
            tuned = json.load(f)
        applied = {}
        for k, v in tuned.get("env", {}).items():
            if k in os.environ:  # user-exported env wins over TUNED.json
                print(f"bench[tuned]: keeping user {k}={os.environ[k]} "
                      f"(TUNED.json wanted {v})", file=sys.stderr, flush=True)
            else:
                os.environ[k] = str(v)
                applied[k] = str(v)
        print(f"bench[tuned]: applying {applied}", file=sys.stderr,
              flush=True)
    chunk = int(os.environ.get("BENCH_CHUNK", "64"))
    sub = int(os.environ.get("BENCH_RENDER_SUB", "4"))
    batch = int(os.environ.get("BENCH_BATCH", str(BATCH)))
    if label == "cpu_fallback_not_tpu":
        batch = int(os.environ.get("BENCH_CPU_BATCH", "4"))
        sub = 2

    tpl = build_template(workload)
    has_tex = bool((np.asarray(tpl.render_atlas.mat_base_tex) >= 0).any())
    kw = dict(
        width=WIDTH, height=HEIGHT, shading="pbr", chunk=chunk,
        ssao=(workload == "textured"),  # reference default: SSAO on
        max_lights=1,
        shadow_size=int(os.environ.get("BENCH_SHADOW", "0")),
        shadow_mode=os.environ.get("BENCH_SHADOW_MODE", "vsm"),
        tile_capacity=int(os.environ.get("BENCH_TILE_CAP", "128")),
        fine_chunk=int(os.environ.get("BENCH_FINE_CHUNK", "128")),
        texture_filter=os.environ.get("BENCH_TEX_FILTER", "trilinear"),
        sample_textures=has_tex,
        sample_stickers=False,
    )
    kw.update(over)
    if refmode:
        kw.update(
            shadow_mode="pcf", ssao_mode="reference", max_lights=3,
            texture_filter="trilinear", shadow_size=0,  # auto: 2048^2 on TPU
        )
    cfg = FrameConfig(**kw)

    try:
        # substep cadence is the reference default; TUNED.json switches the
        # tuned rung to the measured winner (r5: "frame" — faster AND the
        # closest resting-pose distribution, physics/types.py contact_gen)
        solver_cfg = default_config()._replace(
            contact_gen=os.environ.get("BENCH_CONTACT_GEN", "substep"),
            # broadphase budget: the (K, PH, VH) SAT tensors scale the whole
            # narrowphase (profile r4: 256 -> 128 saved 43 ms/scene settle)
            max_narrow_pairs=int(os.environ.get("BENCH_NARROW_PAIRS", "256")),
            # sleep early exit (0 = reference fixed 100x4 churn): scenes stop
            # settling once every body slept this many consecutive frames
            sleep_frames=int(os.environ.get("BENCH_SETTLE_SLEEP", "0")),
        )
        value, compile_warm_s = _attempt(label, tpl, cfg, solver_cfg, batch, sub)
    except _Watchdog:
        print(f"bench[{label}]: WATCHDOG after {WARM_BUDGET}s", file=sys.stderr,
              flush=True)
        sys.exit(3)

    # steady-state throughput (VERDICT r3 item 5): generate_stream keeps
    # `prefetch` batches in flight so the device never idles during host
    # readback — the production number. Reuses the program _attempt compiled.
    # Default OFF on this rig: full-GT readback rides the axon relay tunnel
    # (~5 MB/s observed -> 0.2 scenes/s, pure link bandwidth, not device
    # time); on a host-attached TPU the same loop is device-bound. Measure
    # explicitly with BENCH_STREAM=1.
    steady = None
    if (
        os.environ.get("BENCH_STREAM", "0") == "1"
        and label != "cpu_fallback_not_tpu"
    ):
        from stillleben_tpu.parallel.batch import generate_stream

        n_stream = int(os.environ.get("BENCH_STREAM_BATCHES", "4"))
        # default: the compact training subset, narrowed on device (~3 MB vs
        # ~20 MB/scene) — readback bytes decide this number whenever the
        # host link is slower than the chip. BENCH_STREAM_FIELDS=full reads
        # back every GT plane at f32.
        fields_env = os.environ.get(
            "BENCH_STREAM_FIELDS", "rgb,instance_index,class_index,depth"
        )
        gt_fields = (
            None if fields_env == "full"
            else tuple(f for f in fields_env.split(",") if f)
        )
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(WARM_BUDGET)
        try:
            t0 = time.perf_counter()
            got = 0
            for frames in generate_stream(
                tpl, cfg, solver_cfg, batch=batch, n_batches=n_stream,
                seed=7, render_sub_batch=sub, gt_fields=gt_fields,
            ):
                lead = (
                    next(iter(frames.values()))
                    if isinstance(frames, dict) else frames.rgb
                )
                got += int(np.asarray(lead).shape[0])
            steady = got / (time.perf_counter() - t0)
            print(
                f"bench[{label}]: steady-state {steady:.2f} scenes/s "
                f"({got} scenes, prefetch=2, fields={fields_env})",
                file=sys.stderr, flush=True,
            )
        except _Watchdog:
            print(f"bench[{label}]: stream WATCHDOG", file=sys.stderr, flush=True)
            steady = None
        finally:
            signal.alarm(0)
    print(
        json.dumps(
            {
                "metric": "ycb_tabletop_scenes_per_sec_per_chip_640x480",
                "value": round(value, 3),
                "unit": "scenes/s",
                "vs_baseline": round(value / TARGET_SCENES_PER_SEC, 4),
                "config": label,
                "batch": batch,
                # first-call latency (compile via persistent cache + warm-up)
                # — tracked per VERDICT r3 item 4
                "compile_warm_s": round(compile_warm_s, 1),
                # host-pipelined production throughput (prefetch=2),
                # None when BENCH_STREAM=0
                "steady_scenes_per_sec": (
                    round(steady, 3) if steady is not None else None
                ),
                "workload": (
                    "textured: 3x bunny(69k tris)+7 primitives, IBL light map, "
                    "SSAO, textured bg plane, full GT"
                    if workload == "textured"
                    else "primitives: 10 untextured cubes/spheres (upper bound)"
                ),
            }
        ),
        flush=True,
    )


_PARENT_MARKER = "_SL_BENCH_PARENT"


def main():
    """Orchestrator: CPU-only (re-execs itself with the axon site stripped so
    it never holds the relay tunnel its children need), runs each ladder rung
    in a fresh subprocess until one prints a JSON result."""
    if os.environ.get(_PARENT_MARKER) != "1":
        env = dict(os.environ)
        env[_PARENT_MARKER] = "1"
        env["_SL_BENCH_CHILD_PYTHONPATH"] = env.get("PYTHONPATH", "")
        env["PYTHONPATH"] = _REPO
        env["JAX_PLATFORMS"] = "cpu"
        os.execve(sys.executable, [sys.executable, "-u", os.path.abspath(__file__)], env)

    child_env = dict(os.environ)
    child_env["PYTHONPATH"] = os.environ.get("_SL_BENCH_CHILD_PYTHONPATH", "")
    child_env.pop("JAX_PLATFORMS", None)
    child_env.pop(_PARENT_MARKER, None)

    # Dead-relay short-circuit: when the axon tunnel is down, every child
    # hangs at interpreter start (sitecustomize register() dials the relay
    # BEFORE any in-process watchdog exists), so 4 TPU rungs would burn
    # 4 x the full backstop (~2 h) before the CPU rung runs. One cheap
    # probe with a tight timeout decides instead. A healthy attach
    # completes in well under a minute.
    probe_timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", "300"))
    device_ok = False
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=probe_timeout,
            env=child_env,
        )
        device_ok = probe.returncode == 0 and "ok" in probe.stdout
    except subprocess.TimeoutExpired:
        pass
    if not device_ok:
        print(
            f"bench: device probe failed within {probe_timeout}s — relay "
            "down, skipping TPU rungs", file=sys.stderr, flush=True,
        )

    budget = WARM_BUDGET * (1 + REPEATS) + 300  # backstop only; the child's
    # own SIGALRM should always fire first (clean exit keeps the relay sane)
    refmode = os.environ.get("BENCH_REFMODE", "0") == "1"
    for idx, (workload, label, _) in enumerate(RUNGS):
        if refmode and label != "full":
            continue  # refmode measures exactly one config: reference quality
        if not device_ok and label != "cpu_fallback_not_tpu":
            continue  # relay down: jump straight to the CPU rung
        if label == "tuned" and not os.path.exists(
            os.path.join(_REPO, "TUNED.json")
        ):
            continue  # no measured tuning on record
        env_i = dict(child_env)
        if label == "cpu_fallback_not_tpu":
            # the relay tunnel is gone — run on the CPU backend with the
            # axon site stripped so the child doesn't dial the dead tunnel
            env_i["JAX_PLATFORMS"] = "cpu"
            env_i["PYTHONPATH"] = _REPO
        # a freshly-wedged TPU relay (e.g. a SIGKILLed predecessor) raises
        # FAILED_PRECONDITION on the FIRST device op and recovers within a
        # minute — retry fast startup failures instead of burning the rung
        for attempt in range(3):
            try:
                t0 = time.perf_counter()
                proc = subprocess.run(
                    [sys.executable, "-u", os.path.abspath(__file__), "--rung", str(idx)],
                    capture_output=True, text=True, timeout=budget,
                    cwd=_REPO, env=env_i,
                )
                elapsed = time.perf_counter() - t0
            except subprocess.TimeoutExpired:
                print(f"bench[{label}]: parent backstop timeout — degrading",
                      file=sys.stderr, flush=True)
                proc = None
                break
            if proc.returncode == 0 or elapsed > 120:
                break
            print(f"bench[{label}]: startup failure rc={proc.returncode} after "
                  f"{elapsed:.0f}s — retrying ({attempt + 1}/3)",
                  file=sys.stderr, flush=True)
            time.sleep(45)
        if proc is None:
            continue
        sys.stderr.write(proc.stderr[-4000:])
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode == 0 and lines:
            print(lines[-1], flush=True)
            return
        print(f"bench[{label}]: rc={proc.returncode} — degrading",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "ycb_tabletop_scenes_per_sec_per_chip_640x480",
        "value": 0.0, "unit": "scenes/s", "vs_baseline": 0.0,
        "config": "all rungs failed",
    }))
    sys.exit(1)


if __name__ == "__main__":
    if "--rung" in sys.argv:
        run_rung(int(sys.argv[sys.argv.index("--rung") + 1]))
    else:
        main()
