"""stillleben_tpu — a TPU-native synthetic-data generation framework.

A from-scratch reimplementation of the capabilities of AIS-Bonn/stillleben
(mesh loading, physically plausible scene arrangement, PBR rendering with
dense ground-truth buffers, approximate differentiable rendering), designed
TPU-first: the settle+render inner loop is pure JAX/XLA/Pallas, batches via
``jax.vmap`` and scales across chips via ``jax.sharding``/``shard_map``.

Public API mirrors the reference Python module ``stillleben``
(reference python/stillleben/__init__.py:15-42) so existing datagen scripts
port with an import change:

    import stillleben_tpu as sl
    sl.init()
    mesh = sl.Mesh("cube.glb")
    scene = sl.Scene((640, 480))
    obj = sl.Object(mesh); scene.add_object(obj)
    scene.simulate_tabletop_scene()
    result = sl.RenderPass().render(scene)
    rgb = result.rgb()   # jax.Array on device
"""

from __future__ import annotations

import importlib

__version__ = "0.1.0"

# name -> (module, attribute); resolved lazily so partially-used installs
# don't pay import cost for subsystems they never touch.
_LAZY = {
    "init": (".context", "init"),
    "init_cuda": (".context", "init_cuda"),
    "context": (".context", "context"),
    "Context": (".context", "Context"),
    "Mesh": (".assets.mesh", "Mesh"),
    "MeshCache": (".assets.mesh", "MeshCache"),
    "Object": (".scene.object", "Object"),
    "Scene": (".scene.scene", "Scene"),
    "RenderPass": (".render.render_pass", "RenderPass"),
    "RenderPassResult": (".render.render_pass", "RenderPassResult"),
    "LightMap": (".render.light_map", "LightMap"),
    "Texture": (".assets.texture", "Texture"),
    "Texture2D": (".assets.texture", "Texture2D"),
    "ImageLoader": (".assets.image_loader", "ImageLoader"),
    "ImageSaver": (".assets.image_saver", "ImageSaver"),
    "Animator": (".scene.animator", "Animator"),
    "JobQueue": (".scene.job_queue", "JobQueue"),
    "ManipulationSim": (".scene.manipulation_sim", "ManipulationSim"),
    "Range3D": (".core.range3d", "Range3D"),
    "quat_to_matrix": (".core.quat", "quat_to_matrix"),
    "matrix_to_quat": (".core.quat", "matrix_to_quat"),
    "view": (".viewer", "view"),
    "Viewer": (".viewer", "Viewer"),
    "render_debug_image": (".debug", "render_debug_image"),
    "generate_stream": (".parallel.batch", "generate_stream"),
    "object_annotations": (".annotate", "object_annotations"),
    # submodules exposed as attributes
    "camera_model": (".camera_model", None),
    "diff": (".diff", None),
    "losses": (".losses", None),
    "profiling": (".profiling", None),
    "extension": (".extension", None),
}

__all__ = sorted(_LAZY)


def __getattr__(name: str):
    if name not in _LAZY:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    mod_name, attr = _LAZY[name]
    mod = importlib.import_module(mod_name, __name__)
    value = mod if attr is None else getattr(mod, attr)
    globals()[name] = value
    return value


def __dir__():
    return __all__
