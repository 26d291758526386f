"""Device-side unpacking of the host front-end's compact transfer format.

Per frame the host sends (sizes for a typical 1080p P frame):
  * packed per-MB records, 12 B/MB (~98 KB)   - build_packed(), mbparse.cpp
  * per-slice parameter table (few rows) + dense per-MB slice-table
    indices ONLY for multi-slice pictures (slice ids are not derivable on
    device under FMO, where slices interleave over the MB grid)
  * weight-classed sparse residual stream (~3% density, ~70 KB: 65% of
    blocks are 4-byte single-coefficient records, ~27% 12-byte short
    blocks, the rest 20-byte full blocks)
  * sparse MV/ref exception records (68 B per exception MB: 16 packed
    u32 blocks x13|y13|(ref+1)<<26, ~6% of MBs)
  * nibble-packed intra payloads (mode|avail<<4 per block, intra MBs only)
vs ~9 MB of dense tensors — host->device bandwidth through the chip
interconnect is the decode pipeline's scarcest resource. Everything is
re-densified on device inside the jitted step.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _bitcast(u8s, dtype, per):
    return lax.bitcast_convert_type(u8s.reshape(u8s.shape[0], -1, per),
                                    dtype).reshape(u8s.shape[0], -1)


def scatter_unique(base_rows, ids, updates, n_rows):
    """Scatter per-row updates into `base_rows` ((n_rows,) + row shape)
    with TRULY unique indices: padding/invalid ids (>= n_rows) are
    remapped to one distinct spare row per entry, so unique_indices=True
    is sound (a shared spare row means duplicate indices — undefined
    with the flag, and without it XLA emits the slow generic scatter).
    Returns the updated (n_rows, ...) array."""
    cap = ids.shape[0]
    spare = jnp.zeros((cap,) + base_rows.shape[1:], base_rows.dtype)
    buf = jnp.concatenate([base_rows, spare], axis=0)
    safe = jnp.where(ids < n_rows, ids, n_rows + jnp.arange(cap))
    return buf.at[safe].set(updates.astype(base_rows.dtype),
                            unique_indices=True)[:n_rows]


def _sext8(v):
    """Low byte of an int32/uint32 vector, sign-extended, as int32."""
    return ((v & 0xFF) ^ 0x80).astype(jnp.int32) - 0x80


def _sext16(v):
    return ((v & 0xFFFF) ^ 0x8000).astype(jnp.int32) - 0x8000


def _bytes_of(words):
    """(k,) uint32 -> (k, 4) int32 unsigned byte values (little-endian,
    matching the host's memory order). Pure shift/mask vector math — the
    TPU-friendly replacement for u8 bitcasts (which lower to sublane
    shuffles and dominated the unpack stage's cost)."""
    u = words[:, None] >> (jnp.arange(4, dtype=jnp.uint32) * 8)[None, :]
    return (u & 0xFF).astype(jnp.int32)


def unpack_meta(packed, slice_table, mv_exc_ids, mv_exc_payload,
                intra_mbs, intra_payload, n_mbs, slice_ids=None):
    """Rebuild the per-MB tensor dict from the compact streams.

    packed: (nMB, 3) uint32 record words (12 B/MB: qp | flags<<8 |
    modes<<16 | ref<<24, then packed mv i16x2, then the nnz mask);
    slice_table: (S, 4) i8; slice_ids: (nMB,) u16 table indices
    (None/size-0 for single-slice pictures -> all index 0); mv_exc_*:
    sparse per-block motion (payload as (cap, 16) u32 words); intra_*:
    sparse intra modes. Padding entries use id >= n_mbs (dropped).
    """
    n = n_mbs
    w0 = packed[:, 0]
    t = {}
    if slice_ids is None or slice_ids.shape[0] == 0:
        t["slice_id"] = jnp.zeros((n,), jnp.uint32)
    else:
        t["slice_id"] = slice_ids.astype(jnp.uint32)
    t["qp_y"] = (w0 & 0xFF).astype(jnp.uint8)
    flags = ((w0 >> 8) & 0xFF).astype(jnp.int32)
    t["mb_class"] = (flags & 7).astype(jnp.uint8)
    t["disable_dblk"] = ((flags >> 3) & 3).astype(jnp.uint8)
    av3 = (flags >> 5) & 7
    t["mb_avail"] = ((av3 & 3) | ((av3 >> 2) << 3)).astype(jnp.int32)
    modes = ((w0 >> 16) & 0xFF).astype(jnp.int32)
    t["i16_mode"] = modes & 3
    t["chroma_mode"] = (modes >> 2) & 3
    ref_base = _sext8(w0 >> 24).astype(jnp.int8)
    w1 = packed[:, 1]
    mv_base = jnp.stack([_sext16(w1), _sext16(w1 >> 16)],
                        axis=-1).astype(jnp.int16)          # (n, 2)
    nnz_mask = packed[:, 2]
    t["nnz"] = ((nnz_mask[:, None] >> jnp.arange(24, dtype=jnp.uint32)
                 [None, :]) & 1).astype(jnp.int32)
    t["nnz_dc"] = ((nnz_mask[:, None] >> (24 + jnp.arange(
        3, dtype=jnp.uint32))[None, :]) & 1).astype(jnp.int32)

    # per-slice deblock parameters; concealed MBs override them with zeros
    # (ConcealMb conceal.c:388-392 fixes filterOffsetA/B and
    # chromaQpIndexOffset to 0 regardless of the slice the MB belonged to).
    # One-hot contraction for small tables (see transform.lut_onehot); the
    # one-hot is O(nMB * S), so slice-heavy pictures (e.g. slice-per-row
    # low-latency encodes, S up to nMB) fall back to the plain row gather
    # whose ~73 ns/row price is far below an (nMB, nMB, 4) select+sum.
    from .transform import lut_onehot
    sidx = t["slice_id"].astype(jnp.int32)
    concealed = (t["mb_class"] == 6)[:, None]
    if slice_table.shape[0] <= 64:
        rows = lut_onehot(slice_table.astype(jnp.int32), sidx)
    else:
        rows = slice_table.astype(jnp.int32)[sidx]
    row = jnp.where(concealed, 0, rows)
    t["filter_off_a"] = row[:, 0].astype(jnp.int8)
    t["filter_off_b"] = row[:, 1].astype(jnp.int8)
    t["chroma_qp_offset"] = row[:, 2].astype(jnp.int8)

    # dense MV/ref: broadcast the base, scatter the exceptions
    # (16 packed u32 blocks per exception MB: x13 | y13<<13 | (ref+1)<<26)
    mv = jnp.broadcast_to(mv_base[:, None, :], (n, 16, 2))
    ref = jnp.broadcast_to(ref_base[:, None], (n, 16))
    pk = mv_exc_payload                                    # (cap, 16) u32
    sext13 = lambda v: ((v & 0x1FFF) ^ 0x1000).astype(jnp.int32) - 0x1000
    exc_mv = jnp.stack([sext13(pk), sext13(pk >> 13)],
                       axis=-1).astype(jnp.int16)
    exc_ref = (((pk >> 26) & 0x3F).astype(jnp.int32) - 1).astype(jnp.int8)
    eids = mv_exc_ids.reshape(-1)
    t["mv"] = scatter_unique(mv, eids, exc_mv, n)
    t["ref_slot"] = scatter_unique(ref, eids, exc_ref, n)

    # dense intra modes/avail from the nibble-packed sparse payloads
    # (byte j = mode | avail << 4)
    nib = scatter_unique(jnp.zeros((n, 16), jnp.uint8),
                         intra_mbs.reshape(-1), intra_payload, n)
    t["i4_modes"] = nib & 0xF
    t["i4_avail"] = nib >> 4
    return t


def densify_residual(sparse_ids, sparse_levels, n_mbs):
    """Scatter the sparse residual rows into dense (coeff, luma_dc,
    chroma_dc). Padding entries carry id >= n_mbs*26 and are dropped."""
    buf = scatter_unique(jnp.zeros((n_mbs * 26, 16), jnp.int32),
                         sparse_ids, sparse_levels.astype(jnp.int32),
                         n_mbs * 26)
    buf = buf.reshape(n_mbs, 26, 16)
    return buf[:, :24], buf[:, 24], buf[:, 25, :8]


def unpack_blob(blob, n_mbs, single_cap, short_cap, full_cap, wide_cap,
                exc_cap, intra_cap, stab_cap, sid_cap=0):
    """Split the single transfer blob (FrameTensors::build_blob layout)
    into the eight streams; all offsets are static per tier combo.

    The blob is parsed as uint32 WORDS (every section is 4-byte aligned
    by construction): byte fields come out via shift/mask vector math
    instead of u8 bitcasts, which lower to sublane shuffles on the TPU
    and dominated this stage's cost (~3.3 ms/frame of a 13.7 ms 1080p
    frame before the change). A u8 blob input is converted with one
    whole-buffer bitcast.

    The sparse residual arrives in three weight classes (the host
    classifier cls_single/cls_short/cls_full): 4-byte single-coefficient
    records (65% of 1080p blocks), 12-byte 8-level short blocks (~27%)
    and 20-byte full blocks whose out-of-int8 values travel as a
    wide-escape list. All three re-densify here into one (cap, 16) level
    array so the downstream sparse transform is class-agnostic."""
    n = n_mbs
    if blob.dtype == jnp.uint8:
        words = lax.bitcast_convert_type(blob.reshape(-1, 4), jnp.uint32)
    else:
        words = lax.bitcast_convert_type(blob, jnp.uint32)
    off = 0

    def take(count_words):
        nonlocal off
        out = lax.dynamic_slice_in_dim(words, off, count_words)
        off += count_words
        return out

    packed = take(n * 3).reshape(n, 3)
    stab = _bytes_of(take(stab_cap)).reshape(stab_cap, 4)
    stab = (((stab & 0xFF) ^ 0x80) - 0x80).astype(jnp.int8)  # sign-extend
    # sid_cap is even-rounded by the caller for section alignment; only
    # the first n entries are real per-MB ids
    if sid_cap:
        sw = take(sid_cap // 2)
        sids = jnp.stack([sw & 0xFFFF, sw >> 16],
                         axis=-1).reshape(-1)[:n].astype(jnp.uint16)
    else:
        sids = None

    # single records: u32 = id << 12 | pos << 8 | (value & 0xFF)
    sgl = take(single_cap)
    sgl_ids = (sgl >> 12).astype(jnp.int32)
    sgl_pos = ((sgl >> 8) & 15).astype(jnp.int32)
    sgl_val = _sext8(sgl).astype(jnp.int16)
    # one-hot multiply, not a scatter: per-row scatters serialize on the
    # TPU while this is a pure (cap, 16) elementwise op the compiler
    # fuses with the surrounding bit math
    sgl_lv = jnp.where(sgl_pos[:, None] == jnp.arange(16)[None, :],
                       sgl_val[:, None], jnp.int16(0))

    sht_ids = take(short_cap).astype(jnp.int32)
    sb = _bytes_of(take(short_cap * 2))                  # (cap*2, 4)
    sht8 = (((sb ^ 0x80) - 0x80).astype(jnp.int16)
            .reshape(short_cap, 8))
    sht_lv = jnp.concatenate(
        [sht8, jnp.zeros((short_cap, 8), jnp.int16)], axis=1)

    ids = take(full_cap).astype(jnp.int32)
    fb = _bytes_of(take(full_cap * 4))                   # (cap*4, 4)
    lv8 = ((fb ^ 0x80) - 0x80).reshape(-1)               # (cap*16,) i32
    wide_ids = take(wide_cap).astype(jnp.int32)
    wide_vals = take(wide_cap).astype(jnp.int32)
    flat = jnp.concatenate([lv8.astype(jnp.int16),
                            jnp.zeros((wide_cap,), jnp.int16)])
    safe_w = jnp.where(wide_ids < full_cap * 16, wide_ids,
                       full_cap * 16 + jnp.arange(wide_cap))
    flat = flat.at[safe_w].set(wide_vals.astype(jnp.int16),
                               unique_indices=True)
    full_lv = flat[:full_cap * 16].reshape(full_cap, 16)

    all_ids = jnp.concatenate([sgl_ids, sht_ids, ids])
    all_lv = jnp.concatenate([sgl_lv, sht_lv, full_lv])

    eids = take(exc_cap).astype(jnp.int32)
    epay = take(exc_cap * 16).reshape(-1, 16)            # (cap, 16) u32
    iids = take(intra_cap).astype(jnp.int32)
    ib = _bytes_of(take(intra_cap * 4))                  # (cap*4, 4)
    ipay = ib.astype(jnp.uint8).reshape(-1, 16)          # (cap, 16) u8
    return packed, stab, all_ids, all_lv, eids, epay, iids, ipay, sids
