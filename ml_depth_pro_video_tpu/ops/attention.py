"""Fused multi-head self-attention.

The reference's hot loop is 24 ViT-L blocks over 577-token sequences,
batched over the 35 pyramid patches (3 ViT passes per frame,
`/root/reference/src/depth_pro/network/encoder.py:266`, `:308`,
`fov.py:77`). Torch/timm materializes (B*H, S, S) score tensors; here the
whole attention row for a query block stays in VMEM via a Pallas kernel,
so scores never round-trip through HBM. Sequence length 577 is padded to
a lane multiple and the pad keys are masked with -inf.

The XLA einsum path is kept as the fallback (CPU tests, interpret mode)
and as the numerical reference for the kernel's unit tests.
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


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   key_bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Reference attention. q,k,v: (B, H, S, D); returns (B, H, S, D).
    ``key_bias`` (B, S) is added to every query's scores per KEY before
    the softmax (ToMe proportional attention: log token sizes)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    if key_bias is not None:
        s = s + key_bias[:, None, None, :].astype(s.dtype)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float,
                  heads_per_program: int):
    """One program computes full attention for ``heads_per_program``
    (batch*head) rows — the whole (S_pad, S_pad) score tile lives in
    VMEM, so a 577-token sequence needs no online softmax and the grid
    stays small (few, large programs beat many tiny ones on TPU: each
    program's matmuls are MXU-sized and per-program launch overhead is
    amortized)."""
    for hh in range(heads_per_program):
        q = q_ref[hh]
        k = k_ref[hh]
        v = v_ref[hh]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale
        kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(kidx < seq_len, s, -jnp.inf)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        p = p / denom
        out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[hh] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("heads_per_program",))
def _flash_attention(q, k, v, heads_per_program: int = 2):
    """Pallas fused attention. q,k,v: (B, H, S, D)."""
    b, h, s, d = q.shape
    scale = d**-0.5
    s_pad = _round_up(s, 128)
    bh = b * h
    hp = heads_per_program
    while bh % hp:
        hp -= 1

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0))).reshape(bh, s_pad, d)

    qp, kp, vp = pad(q), pad(k), pad(v)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, seq_len=s, scale=scale, heads_per_program=hp),
        grid=(bh // hp,),
        in_specs=[
            pl.BlockSpec((hp, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hp, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((hp, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, s_pad, d), q.dtype),
    )(qp, kp, vp)
    return out.reshape(b, h, s_pad, d)[:, :, :s, :]


def _packed_kernel(x_ref, o_ref, *, seq_len: int, scale: float,
                   num_heads: int, q_rows: int):
    """One program = one batch item, all heads. ``x_ref`` is the whole
    (s_pad, 3D) HEAD-CONTIGUOUS packed qkv block — head h owns columns
    [h*3hd, (h+1)*3hd) as (q, k, v) — so per-head q/k/v are static lane
    slices, per-head matmuls stay MXU-shaped, and the whole score row
    lives in VMEM. (The head-contiguous packing is what lets tensor
    parallelism shard the qkv projection by whole heads.) Queries are
    trimmed to ``q_rows`` (next sublane multiple of seq_len instead of
    the 128-lane multiple keys need) — 7.5% less score/PV work at
    S=577. Output keeps the standard head-major [h0|h1|...] layout the
    proj matmul expects."""
    hd = (x_ref.shape[-1] // 3) // num_heads
    # additive pad bias instead of a (q_rows, S_pad) where-mask: one
    # broadcast row + fused multiply-add beats the select on the VPU
    # (measured 2.05 -> 1.98 ms/block-batch, scripts/tpu_attn_breakdown)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (1, x_ref.shape[1]), 1)
    bias = jnp.where(kidx < seq_len, 0.0, -jnp.inf)
    for h in range(num_heads):
        base = h * 3 * hd
        q = x_ref[0, :q_rows, base:base + hd]
        k = x_ref[0, :, base + hd:base + 2 * hd]
        v = x_ref[0, :, base + 2 * hd:base + 3 * hd]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :q_rows, h * hd:(h + 1) * hd] = out.astype(o_ref.dtype)


def _packed_kernel_bias(x_ref, bias_ref, o_ref, *, scale: float,
                        num_heads: int, q_rows: int):
    """`_packed_kernel` with a per-key additive bias row (ToMe
    proportional attention: log token sizes; the row ALSO carries the
    -inf pad mask, so the in-kernel iota goes away). Kept as a separate
    kernel so the exact hot path stays untouched when no bias is used."""
    hd = (x_ref.shape[-1] // 3) // num_heads
    # (1, 8, s_pad) sublane-tiled block (see flash_attention_packed_bias:
    # a (1, s_pad) block violates Mosaic's div-8 sublane rule on real
    # TPUs); every row of the tile is the same bias — read one
    bias = bias_ref[0, 0][None, :]  # (1, s_pad): log-size + pad -inf
    for h in range(num_heads):
        base = h * 3 * hd
        q = x_ref[0, :q_rows, base:base + hd]
        k = x_ref[0, :, base + hd:base + 2 * hd]
        v = x_ref[0, :, base + 2 * hd:base + 3 * hd]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, :q_rows, h * hd:(h + 1) * hd] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "block_heads"))
def flash_attention_packed_bias(qkv: jnp.ndarray, key_bias: jnp.ndarray,
                                num_heads: int, interpret: bool = False,
                                block_heads: int | None = None) -> jnp.ndarray:
    """``flash_attention_packed`` with a per-key additive score bias
    (B, S) fp32 — see `_packed_kernel_bias`."""
    b, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    scale = hd**-0.5
    s_pad = _round_up(s, 128)
    q_rows = _round_up(s, 8)
    x = jnp.pad(qkv, ((0, 0), (0, s_pad - s), (0, 0)))
    bias = jnp.pad(key_bias.astype(jnp.float32), ((0, 0), (0, s_pad - s)),
                   constant_values=-jnp.inf)
    # Mosaic requires a block's last two dims to be (sublane=8, lane=128)
    # multiples or exactly the array dims — a (1, s_pad) per-batch bias
    # block satisfies neither and fails to LOWER on real TPUs (caught by
    # the round-5 trained-proxy eval; interpret mode never checks this).
    # Tile each row across one 8-wide sublane axis instead: the block
    # becomes (1, 8, s_pad) and the kernel reads row 0.
    bias = jnp.broadcast_to(bias[:, None, :], (b, 8, s_pad))

    bh = block_heads or num_heads
    assert num_heads % bh == 0
    groups = num_heads // bh
    out = pl.pallas_call(
        functools.partial(_packed_kernel_bias, scale=scale,
                          num_heads=bh, q_rows=q_rows),
        grid=(b, groups),
        in_specs=[
            pl.BlockSpec((1, s_pad, 3 * hd * bh), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, s_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad, hd * bh), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), qkv.dtype),
        interpret=interpret,
    )(x, bias)
    return out[:, :s]


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret", "block_heads"))
def flash_attention_packed(qkv: jnp.ndarray, num_heads: int,
                           interpret: bool = False,
                           block_heads: int | None = None) -> jnp.ndarray:
    """Fused attention straight from the packed qkv projection.

    qkv: (B, S, 3*D) as produced by the qkv matmul, HEAD-CONTIGUOUS:
    columns ordered [h0:(q,k,v) | h1:(q,k,v) | ...] (ckpt conversion
    packs the torch [q|k|v] layout this way). No transpose is ever
    materialized. Grid is (B,): few large programs (all heads inside)
    amortize per-program overhead. Returns (B, S, D) head-major.

    ``block_heads`` splits the heads across a second grid axis — each
    program then holds only ``block_heads`` heads' qkv columns in VMEM
    (the head-contiguous packing makes the head group a contiguous
    column block of both input and output). This is what lets the fp32
    parity mode run the SAME kernel: full-width fp32 blocks blow the
    ~16 MB VMEM budget, head-grouped ones fit.
    """
    b, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    scale = hd**-0.5
    s_pad = _round_up(s, 128)
    q_rows = _round_up(s, 8)
    x = jnp.pad(qkv, ((0, 0), (0, s_pad - s), (0, 0)))

    bh = block_heads or num_heads
    assert num_heads % bh == 0
    groups = num_heads // bh
    out = pl.pallas_call(
        functools.partial(_packed_kernel, seq_len=s, scale=scale,
                          num_heads=bh, q_rows=q_rows),
        grid=(b, groups),
        in_specs=[pl.BlockSpec((1, s_pad, 3 * hd * bh), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, s_pad, hd * bh), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, d), qkv.dtype),
        interpret=interpret,
    )(x)
    return out[:, :s]


def xla_attention_packed(qkv: jnp.ndarray, num_heads: int,
                         key_bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """Reference path for the HEAD-CONTIGUOUS packed layout (CPU/tests,
    fp32 parity, and GSPMD-partitioned programs — the (b, s, nh, 3, hd)
    reshape inherits a whole-head column sharding of the qkv matmul)."""
    b, s, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    x = qkv.reshape(b, s, num_heads, 3, hd)
    q = x[:, :, :, 0].transpose(0, 2, 1, 3)
    k = x[:, :, :, 1].transpose(0, 2, 1, 3)
    v = x[:, :, :, 2].transpose(0, 2, 1, 3)
    out = _xla_attention(q, k, v, key_bias)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d)


# The Pallas kernel has no VJP of its own; training on TPU needs one
# (the CPU dryrun uses the XLA path and never exercises this). Forward
# runs the fused kernel; backward recomputes through the XLA attention
# math — exact same function up to bf16 rounding, and the ViT blocks
# are rematerialized during training anyway.
@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _flash_packed_diff(qkv, num_heads, block_heads=None):
    return flash_attention_packed(qkv, num_heads, block_heads=block_heads)


def _flash_packed_fwd(qkv, num_heads, block_heads=None):
    return flash_attention_packed(qkv, num_heads, block_heads=block_heads), qkv


def _flash_packed_bwd(num_heads, block_heads, qkv, g):
    _, vjp = jax.vjp(lambda q: xla_attention_packed(q, num_heads), qkv)
    return vjp(g)


_flash_packed_diff.defvjp(_flash_packed_fwd, _flash_packed_bwd)


# biased variant: fused forward, XLA-math backward (grads for qkv AND
# the key bias — the merge sizes are size-counts, but keeping the VJP
# total means a future learned bias Just Works)
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _flash_packed_bias_diff(qkv, key_bias, num_heads, block_heads=None):
    return flash_attention_packed_bias(qkv, key_bias, num_heads,
                                       block_heads=block_heads)


def _flash_packed_bias_fwd(qkv, key_bias, num_heads, block_heads=None):
    return (flash_attention_packed_bias(qkv, key_bias, num_heads,
                                        block_heads=block_heads),
            (qkv, key_bias))


def _flash_packed_bias_bwd(num_heads, block_heads, res, g):
    qkv, key_bias = res
    _, vjp = jax.vjp(
        lambda q, kb: xla_attention_packed(q, num_heads, kb), qkv, key_bias)
    return vjp(g)


_flash_packed_bias_diff.defvjp(_flash_packed_bias_fwd, _flash_packed_bias_bwd)


def _fp32_block_heads(num_heads: int, hd: int, s: int) -> int | None:
    """Largest head-group size whose fp32 working set fits comfortably
    in VMEM (double-buffered in/out blocks + score/exp temps <= ~12 MB
    of the 16 MB scope), with the group's column blocks lane-aligned.
    None if no group works (odd head counts with tiny hd)."""
    s_pad = _round_up(s, 128)
    q_rows = _round_up(s, 8)
    best = None
    for bh in range(1, num_heads + 1):
        if num_heads % bh or (hd * bh) % 128:
            continue
        in_out = 2 * (s_pad * 3 * hd * bh + s_pad * hd * bh) * 4
        temps = 3 * q_rows * s_pad * 4
        if in_out + temps <= 12 * 1024 * 1024:
            best = bh
    return best


def attention_packed(qkv: jnp.ndarray, num_heads: int, impl: str | None = None,
                     key_bias: jnp.ndarray | None = None) -> jnp.ndarray:
    impl = impl or _default_impl()
    # Mosaic requires the kernel's last block dim (the head group's
    # packed qkv column slice) to be a lane multiple — small-D models
    # (tiny test config on a real TPU) fall back to XLA. bf16 runs all
    # heads in one program (measured fastest); fp32's bigger working set
    # blows the 16 MB VMEM scope full-width, so it runs the SAME kernel
    # head-grouped (grid over head groups) — parity mode and production
    # share one kernel path. ``key_bias`` (B, S): per-key additive score
    # bias (ToMe proportional attention) via the bias kernel variant.
    d = qkv.shape[-1] // 3
    hd = d // num_heads
    if impl == "pallas" and pltpu is not None:
        if qkv.dtype == jnp.bfloat16 and d % 128 == 0:
            if key_bias is not None:
                return _flash_packed_bias_diff(qkv, key_bias, num_heads)
            return _flash_packed_diff(qkv, num_heads)
        if qkv.dtype == jnp.float32:
            bh = _fp32_block_heads(num_heads, hd, qkv.shape[1])
            if bh is not None:
                if key_bias is not None:
                    return _flash_packed_bias_diff(qkv, key_bias, num_heads, bh)
                return _flash_packed_diff(qkv, num_heads, bh)
    return xla_attention_packed(qkv, num_heads, key_bias)


def _default_impl() -> str:
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        platform = "cpu"
    return "pallas" if platform == "tpu" and pltpu is not None else "xla"


# differentiable wrapper for the (B, H, S, D) kernel — same pattern as
# _flash_packed_diff: fused forward, XLA-math backward
@jax.custom_vjp
def _flash_diff(q, k, v):
    return _flash_attention(q, k, v)


def _flash_diff_fwd(q, k, v):
    return _flash_attention(q, k, v), (q, k, v)


def _flash_diff_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str | None = None,
) -> jnp.ndarray:
    """Self-attention over (B, H, S, D) tensors with 1/sqrt(D) scaling.

    Same guard set as ``attention_packed``: the Pallas path needs the
    TPU backend, bf16 inputs, and a differentiable wrapper (the raw
    kernel has no VJP)."""
    impl = impl or _default_impl()
    if impl == "pallas" and pltpu is not None and q.dtype == jnp.bfloat16:
        return _flash_diff(q, k, v)
    return _xla_attention(q, k, v)

