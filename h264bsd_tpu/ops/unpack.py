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


def unpack_meta(packed, slice_table, mv_exc_ids, mv_exc_payload,
                intra_mbs, intra_payload, n_mbs, slice_ids=None):
    """Rebuild the per-MB tensor dict from the compact streams.

    packed: (nMB*12,) u8; slice_table: (S,4) i8; slice_ids: (nMB,) u16
    table indices (None/size-0 for single-slice pictures -> all index 0);
    mv_exc_*: sparse per-block motion; intra_*: sparse intra modes.
    Padding entries use id == n_mbs (scattered into a spare row).
    """
    n = n_mbs
    rec = packed.reshape(n, 12)
    t = {}
    if slice_ids is None or slice_ids.shape[0] == 0:
        t["slice_id"] = jnp.zeros((n,), jnp.uint32)
    else:
        t["slice_id"] = slice_ids.astype(jnp.uint32)
    t["qp_y"] = rec[:, 0]
    flags = rec[:, 1].astype(jnp.int32)
    t["mb_class"] = (flags & 7).astype(jnp.uint8)
    t["disable_dblk"] = ((flags >> 3) & 3).astype(jnp.uint8)
    av3 = (flags >> 5) & 7
    t["mb_avail"] = ((av3 & 3) | ((av3 >> 2) << 3)).astype(jnp.int32)
    modes = rec[:, 2].astype(jnp.int32)
    t["i16_mode"] = modes & 3
    t["chroma_mode"] = (modes >> 2) & 3
    ref_base = rec[:, 3].astype(jnp.int8)
    mv_base = _bitcast(rec[:, 4:8], jnp.int16, 2)  # (n, 2)
    nnz_mask = _bitcast(rec[:, 8:12], jnp.uint32, 4)[:, 0]
    t["nnz"] = ((nnz_mask[:, None] >> jnp.arange(24)[None, :]) & 1).astype(
        jnp.int32)
    t["nnz_dc"] = ((nnz_mask[:, None] >> (24 + jnp.arange(3))[None, :]) & 1
                   ).astype(jnp.int32)

    # per-slice deblock parameters; concealed MBs override them with zeros
    # (ConcealMb conceal.c:388-392 fixes filterOffsetA/B and
    # chromaQpIndexOffset to 0 regardless of the slice the MB belonged to)
    sidx = t["slice_id"].astype(jnp.int32)
    concealed = (t["mb_class"] == 6)[:, None]
    row = jnp.where(concealed, jnp.zeros_like(slice_table[sidx]),
                    slice_table[sidx])
    t["filter_off_a"] = row[:, 0]
    t["filter_off_b"] = row[:, 1]
    t["chroma_qp_offset"] = row[:, 2]

    # dense MV/ref: broadcast the base, scatter the exceptions
    # (16 packed u32 blocks per exception MB: x13 | y13<<13 | (ref+1)<<26)
    mv = jnp.broadcast_to(mv_base[:, None, :], (n, 16, 2))
    ref = jnp.broadcast_to(ref_base[:, None], (n, 16))
    pk = lax.bitcast_convert_type(
        mv_exc_payload.reshape(-1, 16, 4), jnp.uint32)
    sext13 = lambda v: ((v & 0x1FFF) ^ 0x1000).astype(jnp.int32) - 0x1000
    exc_mv = jnp.stack([sext13(pk), sext13(pk >> 13)],
                       axis=-1).astype(jnp.int16)
    exc_ref = (((pk >> 26) & 0x3F).astype(jnp.int32) - 1).astype(jnp.int8)
    mv = jnp.concatenate([mv, jnp.zeros((1, 16, 2), mv.dtype)]) \
        .at[mv_exc_ids].set(exc_mv, mode="drop")[:n]
    ref = jnp.concatenate([ref, jnp.zeros((1, 16), ref.dtype)]) \
        .at[mv_exc_ids].set(exc_ref, mode="drop")[:n]
    t["mv"] = mv
    t["ref_slot"] = ref

    # dense intra modes/avail from the nibble-packed sparse payloads
    # (byte j = mode | avail << 4)
    nib = jnp.zeros((n + 1, 16), jnp.uint8).at[intra_mbs].set(
        intra_payload, mode="drop")[:n]
    t["i4_modes"] = nib & 0xF
    t["i4_avail"] = nib >> 4
    return t


def densify_residual(sparse_ids, sparse_levels, n_mbs):
    """Scatter the sparse residual rows into dense (coeff, luma_dc,
    chroma_dc). Padding entries must carry id == n_mbs*26 (one spare row)."""
    buf = jnp.zeros((n_mbs * 26 + 1, 16), jnp.int32)
    buf = buf.at[sparse_ids].set(sparse_levels.astype(jnp.int32),
                                 mode="drop", unique_indices=True)
    buf = buf[:n_mbs * 26].reshape(n_mbs, 26, 16)
    return buf[:, :24], buf[:, 24], buf[:, 25, :8]


def unpack_blob(blob, n_mbs, single_cap, short_cap, full_cap, wide_cap,
                exc_cap, intra_cap, stab_cap, sid_cap=0):
    """Split the single transfer blob (FrameTensors::build_blob layout)
    into the eight streams; all offsets are static per tier combo.

    The sparse residual arrives in three weight classes (the host
    classifier cls_single/cls_short/cls_full): 4-byte single-coefficient
    records (65% of 1080p blocks), 12-byte 8-level short blocks (~27%)
    and 20-byte full blocks whose out-of-int8 values travel as a
    wide-escape list. All three re-densify here into one (cap, 16) level
    array so the downstream sparse transform is class-agnostic."""
    n = n_mbs
    off = 0

    def take(count):
        nonlocal off
        out = lax.dynamic_slice_in_dim(blob, off, count)
        off += count
        return out

    packed = take(n * 12)
    stab = lax.bitcast_convert_type(take(stab_cap * 4), jnp.int8) \
        .reshape(stab_cap, 4)
    # sid_cap is even-rounded by the caller for section alignment; only
    # the first n entries are real per-MB ids
    sids = lax.bitcast_convert_type(
        take(sid_cap * 2).reshape(-1, 2), jnp.uint16)[:n] \
        if sid_cap else None

    # single records: u32 = id << 12 | pos << 8 | (value & 0xFF)
    sgl = lax.bitcast_convert_type(take(single_cap * 4).reshape(-1, 4),
                                   jnp.uint32)
    sgl_ids = (sgl >> 12).astype(jnp.int32)
    sgl_pos = ((sgl >> 8) & 15).astype(jnp.int32)
    sgl_val = ((((sgl & 0xFF) ^ 0x80).astype(jnp.int32)) - 0x80) \
        .astype(jnp.int16)
    sgl_lv = jnp.zeros((single_cap, 16), jnp.int16).at[
        jnp.arange(single_cap), sgl_pos].set(sgl_val)

    sht_ids = lax.bitcast_convert_type(take(short_cap * 4).reshape(-1, 4),
                                       jnp.int32)
    sht8 = lax.bitcast_convert_type(take(short_cap * 8), jnp.int8) \
        .reshape(short_cap, 8).astype(jnp.int16)
    sht_lv = jnp.concatenate(
        [sht8, jnp.zeros((short_cap, 8), jnp.int16)], axis=1)

    ids = lax.bitcast_convert_type(take(full_cap * 4).reshape(-1, 4),
                                   jnp.int32)
    lv8 = lax.bitcast_convert_type(take(full_cap * 16), jnp.int8)
    wide_ids = lax.bitcast_convert_type(take(wide_cap * 4).reshape(-1, 4),
                                        jnp.int32)
    wide_vals = lax.bitcast_convert_type(take(wide_cap * 4).reshape(-1, 4),
                                         jnp.int32)
    flat = jnp.concatenate([lv8.astype(jnp.int16),
                            jnp.zeros((1,), jnp.int16)])
    flat = flat.at[wide_ids].set(wide_vals.astype(jnp.int16))
    full_lv = flat[:full_cap * 16].reshape(full_cap, 16)

    all_ids = jnp.concatenate([sgl_ids, sht_ids, ids])
    all_lv = jnp.concatenate([sgl_lv, sht_lv, full_lv])

    eids = lax.bitcast_convert_type(take(exc_cap * 4).reshape(-1, 4),
                                    jnp.int32)
    epay = take(exc_cap * 64).reshape(-1, 64)
    iids = lax.bitcast_convert_type(take(intra_cap * 4).reshape(-1, 4),
                                    jnp.int32)
    ipay = take(intra_cap * 16).reshape(-1, 16)
    return packed, stab, all_ids, all_lv, eids, epay, iids, ipay, sids
