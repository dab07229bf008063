"""Fused DPT residual block: out = x + conv3x3(relu(conv3x3(relu(x)))).

The decoder's FeatureFusionBlock residuals
(`/root/reference/src/depth_pro/network/decoder.py:121-180`) dominate
the ~45 ms/frame decoder cost, and XLA's conv kernels run far below the
MXU ceiling on the SMALL pyramid levels (96^2: ~15 TF vs the ~128 TF
matmul ceiling — scripts/tpu_r2_profile1.out). This kernel reformulates
the pair of 3x3 convs as VMEM-resident MXU matmuls and fuses the whole
block: one HBM read of x, one write of out — no intermediate feature
map round-trips.

Layout trick (what makes every tap a rank-2 dot): images live
ROW-FLATTENED — (H*(W+4), C) with 2 zero pad columns on each side — so
a 3x3 tap at offset (dy, dx) is the CONTIGUOUS flat slice starting at
dy*(W+4) + dx, and each tap is a plain (M, C) @ (C, C) matmul. The 2
junk columns at each row seam never contaminate valid outputs (an
output at valid column c only reads columns c..c+2 of the same flat
row, all < W+4); the caller strips them with a (free, fused) slice.
The flattening/padding lives OUTSIDE the kernel in XLA, so the kernel
body performs no reshapes at all.

bf16-only (the model's conv path accumulates in the compute dtype
anyway — ops/conv.py; fp32 parity mode keeps the XLA path). Grid is
(batch, row-tiles); each program DMAs its flat tile (plus halo rows)
from HBM into VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _resblock_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                     xt_ref, sem, *, T: int, W: int, C: int):
    """One program: output rows [i*T, i*T + T) of batch item b.
    xt scratch holds flat rows of the padded input: tile rows [-2, T+4)
    relative to the output tile, plus 2 junk rows absorbing the fixed-
    length tap slices' tail over-read (junk only ever reaches junk
    output positions — row-seam columns or the extra h row)."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    Sw = W + 4

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * T * Sw, (T + 4) * Sw)], xt_ref.at[:(T + 4) * Sw],
        sem)
    dma.start()
    xt_ref[(T + 4) * Sw:] = jnp.zeros((2 * Sw, C), xt_ref.dtype)
    dma.wait()

    xt = xt_ref[:]
    rx = jnp.maximum(xt, 0.0)
    # Mosaic REQUIRES 32-bit matmul accumulation ('tpu.matmul acc must
    # be 32-bit'), and unlike an XLA-level dot it costs nothing here —
    # measured at the same rate as the bf16 XLA convs (and it matches
    # XLA conv rounding, which also accumulates f32 internally)
    acc_dt = jnp.float32

    # conv1 over h rows [-1, T+1) (+1 junk row), cols [0, W+2) at col
    # offset -1: h_flat[r*Sw + c] = conv1 output at (global row
    # i*T+r-1, global col c-1)
    n1 = (T + 3) * Sw
    h = None
    for dy in range(3):
        for dx in range(3):
            off = dy * Sw + dx
            part = jnp.dot(rx[off:off + n1], w1_ref[dy * 3 + dx],
                           preferred_element_type=acc_dt)
            h = part if h is None else h + part
    h = jnp.maximum(h + b1_ref[0][None, :].astype(acc_dt), 0.0)

    # conv2 sees h ZERO-PADDED (torch pad=1 semantics): h positions
    # outside the image (global col -1 / W, global row -1 / H) must be
    # zero, not the seamless conv1 value over padded x. Rows at TILE
    # seams stay — they are real neighbor-region outputs.
    idx = jax.lax.broadcasted_iota(jnp.int32, (n1, 1), 0)
    col = idx % Sw
    row = idx // Sw
    valid = (col >= 1) & (col <= W)
    valid &= ~((i == 0) & (row == 0))
    valid &= ~((i == pl.num_programs(1) - 1) & (row == T + 1))
    h = jnp.where(valid, h, 0.0).astype(xt.dtype)

    # conv2 over out rows [0, T): o_flat[r*Sw + c] = out (global row
    # i*T+r, col c); cols >= W are junk the caller strips
    n2 = T * Sw
    o = None
    for dy in range(3):
        for dx in range(3):
            off = dy * Sw + dx
            part = jnp.dot(h[off:off + n2], w2_ref[dy * 3 + dx],
                           preferred_element_type=acc_dt)
            o = part if o is None else o + part
    o = o + b2_ref[0][None, :].astype(acc_dt)
    # residual add: original (un-relu'd) x at (row r+2, col c+2) =
    # flat offset 2*Sw + 2 — contiguous in the flat layout
    o_ref[0] = o.astype(o_ref.dtype) + xt[2 * Sw + 2:2 * Sw + 2 + n2]


def _pick_tile(h: int, w: int, c: int, itemsize: int = 2,
               budget: int = 12 * 1024 * 1024) -> int:
    """Largest row-tile T dividing h whose working set fits in VMEM
    (xt + relu temp + h + relu temp + o + double-buffered out block +
    both weight sets)."""
    sw = w + 4
    budget -= 2 * 9 * c * c * itemsize
    best = 1
    for t in range(h, 0, -1):
        if h % t:
            continue
        need = ((t + 6) * sw * 2      # xt + rx temp
                + (t + 3) * sw * 2    # h + relu/mask temp
                + t * sw * 3) * c * itemsize  # o + 2x out block
        if need <= budget:
            best = t
            break
    return best


@functools.partial(jax.jit, static_argnames=("interpret",))
def _resblock_pallas(x, w1, b1, w2, b2, interpret=False):
    bsz, h, w, c = x.shape
    t = _pick_tile(h, w, c)
    sw = w + 4
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    xp = xp.reshape(bsz, (h + 4) * sw, c)

    kern = functools.partial(_resblock_kernel, T=t, W=w, C=c)
    out = pl.pallas_call(
        kern,
        grid=(bsz, h // t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9, c, c), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, c), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t * sw, c), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h * sw, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM(((t + 6) * sw, c), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, w1, b1, w2, b2)
    # strip the 4 junk columns per row (lazy slice — fuses into the
    # consumer, no materialized copy)
    return out.reshape(bsz, h, sw, c)[:, :, :w, :]


def _xla_residual(x, w1, b1, w2, b2):
    from .conv import conv2d

    h = jax.nn.relu(x)
    h = conv2d(h, w1, b1, padding=1)
    h = jax.nn.relu(h)
    h = conv2d(h, w2, b2, padding=1)
    return x + h


# the Pallas kernel has no VJP of its own; backward recomputes through
# the XLA composition (same pattern as ops/attention.py)
@jax.custom_vjp
def _resblock_diff(x, w1f, b1r, w2f, b2r):
    return _resblock_pallas(x, w1f, b1r, w2f, b2r)


def _resblock_diff_fwd(x, w1f, b1r, w2f, b2r):
    return _resblock_pallas(x, w1f, b1r, w2f, b2r), (
        x, w1f, b1r, w2f, b2r)


def _resblock_diff_bwd(res, g):
    x, w1f, b1r, w2f, b2r = res
    c = x.shape[-1]

    def ref(x, w1f, b1r, w2f, b2r):
        return _xla_residual(x, w1f.reshape(3, 3, c, c), b1r[0],
                             w2f.reshape(3, 3, c, c), b2r[0])

    _, vjp = jax.vjp(ref, x, w1f, b1r, w2f, b2r)
    return vjp(g)


_resblock_diff.defvjp(_resblock_diff_fwd, _resblock_diff_bwd)


def residual_block(x, w1, b1, w2, b2, impl: str | None = None,
                   interpret: bool = False):
    """x + conv2(relu(conv1(relu(x)))), convs 3x3 pad 1.

    x: (B, H, W, C); w: (3, 3, C, C) HWIO; b: (C,). Uses the fused
    Pallas kernel on TPU for bf16 square-channel blocks at the SMALL
    pyramid levels (W <= 96) — measured on v5e b8
    (scripts/tpu_decoder_profile.out, tpu_resblock_check.out): the
    kernel ties XLA per-op at 48^2/96^2 while removing the intermediate
    HBM round-trips (whole decoder 204 vs 211 ms/b8). At 192^2+ XLA
    convs approach the ceiling and the kernel's halo+pad FLOP overhead
    (x1.4 at tile 8) loses — XLA path. (An early batch-1 probe showed a
    ~40 ms 48^2 XLA pathology that did NOT reproduce at batch 8 in
    context — recorded honestly in docs/PERFORMANCE.md.)
    Everything else (CPU tests, fp32 parity mode, odd shapes) also
    takes the XLA composition.
    """
    if impl is None:
        try:
            impl = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
        except Exception:  # pragma: no cover
            impl = "xla"
    cin = w1.shape[2]
    if ((impl == "pallas" or interpret) and pltpu is not None
            and x.dtype == jnp.bfloat16 and cin == w1.shape[3] == x.shape[-1]
            and cin % 128 == 0 and x.shape[2] <= 96):
        wf1 = w1.astype(x.dtype).reshape(9, cin, cin)
        wf2 = w2.astype(x.dtype).reshape(9, cin, cin)
        if interpret:  # test path: raw kernel, no VJP wrapper
            return _resblock_pallas(x, wf1, b1.astype(x.dtype)[None, :],
                                    wf2, b2.astype(x.dtype)[None, :],
                                    interpret=True)
        return _resblock_diff(x, wf1, b1.astype(x.dtype)[None, :],
                              wf2, b2.astype(x.dtype)[None, :])
    return _xla_residual(x, w1, b1, w2, b2)
