"""Pallas TPU kernel for the SAT hull-hull narrowphase.

The XLA path (physics/contacts.py pair_contacts) materializes ~8 tensors of
shape (NP, PH, VH) in HBM per substep — at NP=256, PH=VH=64 that is ~33 MB
per scene per substep, and the 100x4 settle loop is bandwidth-bound on them
(measured: halving NP halves settle time). This kernel evaluates the whole
per-pair SAT — face gaps both ways, the centroid axis, reference-face
selection, lateral containment, and the top-8 manifold extraction — for a
block of pairs entirely in VMEM, so only the per-pair INPUTS (gathered hull
planes/verts, ~2 KB/pair) and per-contact OUTPUTS (8 points+depths, ~100 B/
pair) ever touch HBM.

Semantics are identical to pair_contacts' XLA math (same masks, same
tie-breaking: argmax picks the lowest index, top-8 is depth-descending with
index-order ties); tests/test_physics.py asserts agreement in interpret mode.

Replaces: PhysX narrowphase GJK/EPA use in the reference
(src/scene.cpp:612-700 via PxScene::simulate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MANIFOLD_K = 8  # CONTACTS_PER_PAIR (4 deepest of B in A + 4 of A in B class)

_BIG = 1e30  # plain python floats: jnp constants at module scope would be
_NEG = -1e30  # captured by the kernel as consts, which pallas_call rejects


def _plane_vert_sd(n, d, verts):
    """Signed distance of every vert against every plane.

    n (PB, PH, 3), d (PB, PH), verts (PB, VH, 3) -> (PB, PH, VH) via three
    rank-1 broadcast FMAs (contraction depth 3 is useless on the MXU)."""
    acc = (
        n[:, :, 0:1] * verts[:, :, 0][:, None, :]
        + n[:, :, 1:2] * verts[:, :, 1][:, None, :]
        + n[:, :, 2:3] * verts[:, :, 2][:, None, :]
    )
    return acc + d[:, :, None]


def _argmax_lowest(x, valid, iota):
    """(PB, N) masked argmax picking the LOWEST index on ties (matches
    jnp.argmax). Returns (best (PB, 1), idx (PB, 1) f32)."""
    xv = jnp.where(valid, x, _NEG)
    best = jnp.max(xv, axis=1, keepdims=True)
    hit = xv == best
    idx = jnp.min(jnp.where(hit, iota, _BIG), axis=1, keepdims=True)
    return best, idx


def _kernel(
    pa_ref,    # (PB, PH, 4) world planes of hull A
    pva_ref,   # (PB, PH) f32 1 = valid plane
    va_ref,    # (PB, VH, 3) world verts of hull A
    vva_ref,   # (PB, VH) f32 1 = valid vert
    pb_ref, pvb_ref, vb_ref, vvb_ref,   # same for hull B
    dc_ref,    # (PB, 3) unit centroid axis A -> B
    depth_out,  # (PB, K)
    point_out,  # (PB, K, 3)
    normal_out,  # (PB, 3)
    sep_out,    # (PB, 1) best separation (SAT gap)
):
    # Masks stay f32 0/1 throughout, and every mask that must broadcast over
    # a trailing dim is applied as an ARITHMETIC blend (m*x + (1-m)*y) —
    # Mosaic cannot broadcast 1-bit vectors along minor dims (the
    # fine_raster lesson), and bool-typed selects lower to i8->i1
    # truncations it rejects. Same-shape comparisons/selects are fine.
    pa = pa_ref[...]
    pva_f = pva_ref[...]
    va = va_ref[...]
    vva_f = vva_ref[...]
    pb = pb_ref[...]
    pvb_f = pvb_ref[...]
    vb = vb_ref[...]
    vvb_f = vvb_ref[...]
    d_c = dc_ref[...]

    PB, PH = pa.shape[0], pa.shape[1]
    VH = va.shape[1]
    # Mosaic only has integer iota; convert after (exact to 2^24)
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (PB, PH), 1).astype(jnp.float32)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (PB, VH), 1).astype(jnp.float32)

    def face_gaps(planes, pvalid_f, verts, vvalid_f):
        sd = _plane_vert_sd(planes[..., :3], planes[..., 3], verts)
        m = vvalid_f[:, None, :]  # f32 broadcast over the plane axis
        sd_v = sd * m + _BIG * (1.0 - m)
        gap = jnp.min(sd_v, axis=2)  # (PB, PH)
        return gap * pvalid_f + _NEG * (1.0 - pvalid_f)

    gaps_a = face_gaps(pa, pva_f, vb, vvb_f)
    gaps_b = face_gaps(pb, pvb_f, va, vva_f)
    best_a_gap, best_a_idx = _argmax_lowest(gaps_a, True, iota_p)
    best_b_gap, best_b_idx = _argmax_lowest(gaps_b, True, iota_p)

    # centroid axis: support of A along d_c vs support of B against it
    proj_a = (
        d_c[:, 0:1] * va[:, :, 0] + d_c[:, 1:2] * va[:, :, 1]
        + d_c[:, 2:3] * va[:, :, 2]
    )  # (PB, VH)
    proj_b = (
        d_c[:, 0:1] * vb[:, :, 0] + d_c[:, 1:2] * vb[:, :, 1]
        + d_c[:, 2:3] * vb[:, :, 2]
    )
    supp_a = jnp.max(
        proj_a * vva_f + _NEG * (1.0 - vva_f), axis=1, keepdims=True
    )
    supp_b = jnp.min(
        proj_b * vvb_f + _BIG * (1.0 - vvb_f), axis=1, keepdims=True
    )
    gap_c = supp_b - supp_a  # (PB, 1)

    best_face = jnp.maximum(best_a_gap, best_b_gap)
    separation = jnp.maximum(best_face, gap_c)
    use_c_f = jnp.where(gap_c >= best_face, 1.0, 0.0)  # (PB, 1) f32
    use_a_f = jnp.where(best_a_gap >= best_b_gap, 1.0, 0.0) * (1.0 - use_c_f)

    # reference plane: one-hot select the best face of the chosen hull
    m_a = jnp.where(iota_p == best_a_idx, 1.0, 0.0)  # (PB, PH)
    m_b = jnp.where(iota_p == best_b_idx, 1.0, 0.0)

    def select_plane(planes, m):
        return jnp.stack(
            [jnp.sum(planes[..., i] * m, axis=1) for i in range(4)], axis=-1
        )  # (PB, 4)

    p_ref_a = select_plane(pa, m_a)
    p_ref_b = select_plane(pb, m_b)
    p_ref_c = jnp.concatenate([d_c, -supp_a], axis=-1)
    p_ref = use_c_f * p_ref_c + (1.0 - use_c_f) * (
        use_a_f * p_ref_a + (1.0 - use_a_f) * p_ref_b
    )
    normal = use_c_f * d_c + (1.0 - use_c_f) * (
        use_a_f * p_ref_a[:, :3] - (1.0 - use_a_f) * p_ref_b[:, :3]
    )

    ref_f = jnp.minimum(use_a_f + use_c_f, 1.0)  # (PB, 1): 1 = ref hull is A
    ref3 = ref_f[:, :, None]
    inc_verts = ref3 * vb + (1.0 - ref3) * va  # (PB, VH, 3)
    inc_valid_f = ref_f * vvb_f + (1.0 - ref_f) * vva_f  # (PB, VH)
    depth_ref = -(
        inc_verts[:, :, 0] * p_ref[:, 0:1]
        + inc_verts[:, :, 1] * p_ref[:, 1:2]
        + inc_verts[:, :, 2] * p_ref[:, 2:3]
        + p_ref[:, 3:4]
    )  # (PB, VH)

    ref_planes = ref3 * pa + (1.0 - ref3) * pb  # (PB, PH, 4)
    ref_pvalid_f = ref_f * pva_f + (1.0 - ref_f) * pvb_f  # (PB, PH)
    ndot = (
        ref_planes[..., 0] * p_ref[:, 0:1]
        + ref_planes[..., 1] * p_ref[:, 1:2]
        + ref_planes[..., 2] * p_ref[:, 2:3]
    )  # (PB, PH)
    is_side_f = jnp.where(jnp.abs(ndot) < 0.95, ref_pvalid_f, 0.0)
    sd_side = _plane_vert_sd(ref_planes[..., :3], ref_planes[..., 3], inc_verts)
    ms = is_side_f[:, :, None]
    sd_lateral = jnp.max(
        sd_side * ms + _NEG * (1.0 - ms), axis=1
    )  # (PB, VH)
    ok_f = jnp.where(sd_lateral <= 0.02, inc_valid_f, 0.0)  # (PB, VH)

    score_l = depth_ref * ok_f + _NEG * (1.0 - ok_f)
    has_lat = jnp.max(
        jnp.where(score_l > _NEG, 1.0, 0.0), axis=1, keepdims=True
    )  # (PB, 1) f32
    score_u = depth_ref * inc_valid_f + _NEG * (1.0 - inc_valid_f)
    score = has_lat * score_l + (1.0 - has_lat) * score_u

    # top-K manifold extraction: K rounds of (max, lowest-index one-hot)
    depths = []
    points = []
    for _ in range(MANIFOLD_K):
        best, idx = _argmax_lowest(score, True, iota_v)
        onehot = iota_v == idx  # (PB, VH)
        m = onehot.astype(jnp.float32)
        pt = jnp.stack(
            [jnp.sum(inc_verts[..., i] * m, axis=1) for i in range(3)],
            axis=-1,
        )  # (PB, 3)
        depths.append(best)
        points.append(pt)
        score = jnp.where(onehot, _NEG, score)

    depth_out[...] = jnp.concatenate(depths, axis=1)  # (PB, K)
    point_out[...] = jnp.stack(points, axis=1)  # (PB, K, 3)
    normal_out[...] = normal
    sep_out[...] = separation


@functools.partial(
    jax.jit, static_argnames=("pair_block", "interpret")
)
def sat_narrowphase_pallas(
    pa: jax.Array,   # (NP, PH, 4) world planes of hull A per pair
    pva: jax.Array,  # (NP, PH) f32 validity
    va: jax.Array,   # (NP, VH, 3)
    vva: jax.Array,  # (NP, VH) f32
    pb: jax.Array,
    pvb: jax.Array,
    vb: jax.Array,
    vvb: jax.Array,
    d_c: jax.Array,  # (NP, 3) unit centroid axis
    *,
    pair_block: int = 32,
    interpret: bool = False,
):
    """Returns (depth (NP, K), points (NP, K, 3), normal (NP, 3),
    separation (NP, 1)) — the manifold of pair_contacts before masking.

    ``pair_block`` bounds the kernel's VMEM working set: the SAT
    intermediates are (PB, PH, VH) f32 (~917 KB at PB=128, PH=56, VH=32) and
    several are live at once; under the datagen vmap Mosaic's scoped-vmem
    accounting multiplies further (observed 47 MB > 16 MB at PB=128, B=8).
    SL_SAT_BLOCK overrides for hardware tuning."""
    import os

    NP = pa.shape[0]
    pair_block = int(os.environ.get("SL_SAT_BLOCK", str(pair_block)))
    PB = min(pair_block, NP)
    pad = (-NP) % PB
    if pad:
        padder = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        pa, pva, va, vva = padder(pa), padder(pva), padder(va), padder(vva)
        pb, pvb, vb, vvb = padder(pb), padder(pvb), padder(vb), padder(vvb)
        d_c = padder(d_c)
    n_blocks = (NP + pad) // PB

    PH = pa.shape[1]
    VH = va.shape[1]

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (PB,) + shape, lambda i: (i,) + (0,) * nd, memory_space=pltpu.VMEM
        )

    depth, points, normal, sep = pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[
            spec((PH, 4)), spec((PH,)), spec((VH, 3)), spec((VH,)),
            spec((PH, 4)), spec((PH,)), spec((VH, 3)), spec((VH,)),
            spec((3,)),
        ],
        out_specs=(
            spec((MANIFOLD_K,)), spec((MANIFOLD_K, 3)), spec((3,)), spec((1,)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NP + pad, MANIFOLD_K), jnp.float32),
            jax.ShapeDtypeStruct((NP + pad, MANIFOLD_K, 3), jnp.float32),
            jax.ShapeDtypeStruct((NP + pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((NP + pad, 1), jnp.float32),
        ),
        interpret=interpret,
    )(pa, pva, va, vva, pb, pvb, vb, vvb, d_c)
    return depth[:NP], points[:NP], normal[:NP], sep[:NP]
