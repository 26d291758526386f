#include "mbparse.h"

#include <algorithm>

#include "cavlc.h"
#include "slicegroupmap.h"
#include <cstdio>
#include <cstdlib>
#define MBDBG(...) do { if (getenv("H264TPU_DEBUG")) fprintf(stderr, __VA_ARGS__); } while (0)

namespace h264tpu {

namespace {

// ---------------------------------------------------------------------------
// Neighbour geometry. The reference encodes these relationships as literal
// tables (h264bsd_neighbour.c:65-100, h264bsd_inter_prediction.c:85-170);
// here they are derived once at startup from block geometry, which also
// documents the rules: a neighbour block inside the current MB is available
// for prediction only if it precedes the current block/partition in decoding
// order.
// ---------------------------------------------------------------------------

enum NbMb : u8 { NB_A = 0, NB_B = 1, NB_C = 2, NB_D = 3, NB_CURR = 4, NB_NA = 5 };

struct NbRef {
  u8 mb = NB_NA;   // which macroblock
  u8 index = 0;    // zigzag 4x4 block index inside that macroblock
};

// the 4x4-block zigzag permutation is an involution: raster->zigzag equals
// zigzag->raster
constexpr u8 kRas2Zig[16] = {0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15};

u8 ras2zig(u32 bx, u32 by) { return kRas2Zig[by * 4 + bx]; }

// Per-4x4-block A/B neighbours for all 24 blocks (16 luma + 4 cb + 4 cr) and
// C/D for luma, matching reference N_*_4x4B tables.
struct BlockNbTables {
  NbRef a[24], b[24], c[16], d[16];

  BlockNbTables() {
    for (u32 z = 0; z < 16; ++z) {
      u32 r = kZig2Ras[z];
      i32 bx = i32(r % 4), by = i32(r / 4);
      a[z] = bx == 0 ? NbRef{NB_A, ras2zig(3, by)}
                     : NbRef{NB_CURR, ras2zig(bx - 1, by)};
      b[z] = by == 0 ? NbRef{NB_B, ras2zig(bx, 3)}
                     : NbRef{NB_CURR, ras2zig(bx, by - 1)};
      // C: above-right; inside the MB it must precede z in zigzag order
      if (by == 0) {
        c[z] = bx < 3 ? NbRef{NB_B, ras2zig(bx + 1, 3)}
                      : NbRef{NB_C, ras2zig(0, 3)};
      } else if (bx == 3) {
        c[z] = NbRef{NB_NA, 0};
      } else {
        u8 nz = ras2zig(bx + 1, by - 1);
        c[z] = nz < z ? NbRef{NB_CURR, nz} : NbRef{NB_NA, nz};
      }
      // D: above-left
      if (bx == 0 && by == 0) {
        d[z] = NbRef{NB_D, 15};
      } else if (bx == 0) {
        d[z] = NbRef{NB_A, ras2zig(3, by - 1)};
      } else if (by == 0) {
        d[z] = NbRef{NB_B, ras2zig(bx - 1, 3)};
      } else {
        d[z] = NbRef{NB_CURR, ras2zig(bx - 1, by - 1)};
      }
    }
    // chroma blocks (2x2 grids), indices 16..19 (cb) and 20..23 (cr); only
    // A/B are ever used (CAVLC nC context)
    for (u32 plane = 0; plane < 2; ++plane) {
      u32 base = 16 + plane * 4;
      for (u32 i = 0; i < 4; ++i) {
        u32 bx = i % 2, by = i / 2;
        a[base + i] = bx == 0 ? NbRef{NB_A, u8(base + by * 2 + 1)}
                              : NbRef{NB_CURR, u8(base + by * 2)};
        b[base + i] = by == 0 ? NbRef{NB_B, u8(base + 2 + bx)}
                              : NbRef{NB_CURR, u8(base + bx)};
      }
    }
  }
};

const BlockNbTables kNb;

// Sub-macroblock partition neighbours, indexed [mbPart][subMbPartMode]
// [subPartIdx] (reference N_*_SUB_PART tables, inter_prediction.c:85-170).
struct SubPartNbTables {
  NbRef a[4][4][4], b[4][4][4], c[4][4][4], d[4][4][4];

  SubPartNbTables() {
    for (u32 p = 0; p < 4; ++p) {
      u32 px = (p & 1) * 2, py = (p >> 1) * 2;
      for (u32 m = 0; m < 4; ++m) {
        // sub-partition sizes in 4x4 units: 8x8, 8x4, 4x8, 4x4
        u32 w = (m == 0 || m == 1) ? 2 : 1;
        u32 h = (m == 0 || m == 2) ? 2 : 1;
        u32 n_parts = (m == 0) ? 1 : (m == 3 ? 4 : 2);
        for (u32 s = 0; s < n_parts; ++s) {
          u32 sx, sy;  // sub-part position in 4x4 units inside the 8x8
          if (m == 0) { sx = 0; sy = 0; }
          else if (m == 1) { sx = 0; sy = s; }        // 8x4 stacked
          else if (m == 2) { sx = s; sy = 0; }        // 4x8 side by side
          else { sx = s & 1; sy = s >> 1; }           // 4x4 quad
          i32 bx = i32(px + sx * w), by = i32(py + sy * h);

          a[p][m][s] = resolve(bx - 1, by, p, m, s, /*require_order=*/false);
          b[p][m][s] = resolve(bx, by - 1, p, m, s, false);
          c[p][m][s] = resolve(bx + i32(w), by - 1, p, m, s, true);
          d[p][m][s] = resolve(bx - 1, by - 1, p, m, s, false);
        }
      }
    }
  }

 private:
  // Map block coordinates to a neighbour reference. When require_order is
  // set (above-right neighbour) an in-MB block is only available if its
  // (part, sub-part) precedes the current one in decoding order.
  static NbRef resolve(i32 bx, i32 by, u32 p, u32 m, u32 s, bool require_order) {
    if (bx < 0 && by < 0) return {NB_D, 15};
    if (bx > 3 && by < 0) return {NB_C, ras2zig(0, 3)};
    if (bx < 0) return {NB_A, ras2zig(3, by)};
    if (by < 0) return bx > 3 ? NbRef{NB_NA, 0} : NbRef{NB_B, ras2zig(bx, 3)};
    if (bx > 3) return {NB_NA, 0};
    u8 nz = ras2zig(bx, by);
    if (!require_order) return {NB_CURR, nz};
    u32 np = u32(by / 2) * 2 + u32(bx / 2);
    if (np < p) return {NB_CURR, nz};
    if (np > p) return {NB_NA, nz};
    // same 8x8: earlier sub-part only; sub-part of (bx,by) under mode m
    u32 w = (m == 0 || m == 1) ? 2 : 1;
    u32 h = (m == 0 || m == 2) ? 2 : 1;
    u32 lx = u32(bx) % 2, ly = u32(by) % 2;
    u32 ns;
    if (m == 0) ns = 0;
    else if (m == 1) ns = ly / h;
    else if (m == 2) ns = lx / w;
    else ns = (ly << 1 | lx);
    return ns < s ? NbRef{NB_CURR, nz} : NbRef{NB_NA, nz};
  }
};

const SubPartNbTables kSubNb;

// Inter neighbour snapshot (reference interNeighbour_t + GetInterNeighbour,
// inter_prediction.c:963-996).
struct InterNb {
  bool available = false;
  u32 ref_index = 0xFFFFFFFFu;
  i16 mv[2] = {0, 0};
};

i32 median3(i32 a, i32 b, i32 c) {
  // reference MedianFilter inter_prediction.c:920-957
  i32 mx = a, mn = a, med = a;
  if (b > mx) mx = b; else if (b < mn) mn = b;
  if (c > mx) med = mx; else if (c < mn) med = mn; else med = c;
  return med;
}

void prediction_mv(i16 out[2], const InterNb a[3], u32 ref_index) {
  // reference GetPredictionMv inter_prediction.c:999-1028
  if (a[1].available || a[2].available || !a[0].available) {
    u32 is_a = a[0].ref_index == ref_index;
    u32 is_b = a[1].ref_index == ref_index;
    u32 is_c = a[2].ref_index == ref_index;
    if (is_a + is_b + is_c != 1) {
      out[0] = i16(median3(a[0].mv[0], a[1].mv[0], a[2].mv[0]));
      out[1] = i16(median3(a[0].mv[1], a[1].mv[1], a[2].mv[1]));
    } else if (is_a) {
      out[0] = a[0].mv[0]; out[1] = a[0].mv[1];
    } else if (is_b) {
      out[0] = a[1].mv[0]; out[1] = a[1].mv[1];
    } else {
      out[0] = a[2].mv[0]; out[1] = a[2].mv[1];
    }
  } else {
    out[0] = a[0].mv[0];
    out[1] = a[0].mv[1];
  }
}

// MV range limits (reference inter_prediction.c:537-544): horizontal
// [-2048, 2047.75], vertical [-512, 511.75] in quarter-pel units.
bool mv_in_range(i32 hor, i32 ver) {
  return u32(hor + 8192) < 16384 && u32(ver + 2048) < 4096;
}

u32 num_mb_part(u32 mb_type) {
  // reference h264bsdNumMbPart macroblock_layer.c:259-291
  if (mb_type == kPSkip || mb_type == kP16x16) return 1;
  if (mb_type == kP16x8 || mb_type == kP8x16) return 2;
  return 4;
}

u32 num_sub_mb_part(u32 sub_type) { return sub_type == 0 ? 1 : (sub_type == 3 ? 4 : 2); }

bool mb_is_inter(u32 t) { return t <= kP8x8ref0; }
bool mb_is_i4(u32 t) { return t == kI4x4; }

// dequant scale index by raster position (levelScale column selection,
// reference h264bsd_transform.c:120-155).
constexpr u8 kScaleIdx[16] = {0, 1, 0, 1, 1, 2, 1, 2, 0, 1, 0, 1, 1, 2, 1, 2};
constexpr i32 kLevelScale[6][3] = {{10, 13, 16}, {11, 14, 18}, {13, 16, 20},
                                   {14, 18, 23}, {16, 20, 25}, {18, 23, 29}};

}  // namespace

void FrameTensors::reset(u32 w_mbs, u32 h_mbs) {
  width_mbs = w_mbs;
  height_mbs = h_mbs;
  n_mbs = w_mbs * h_mbs;
  mb_class.assign(n_mbs, 0);
  qp_y.assign(n_mbs, 0);
  slice_id.assign(n_mbs, 0);
  decoded.assign(n_mbs, 0);
  disable_dblk.assign(n_mbs, 0);
  filter_off_a.assign(n_mbs, 0);
  filter_off_b.assign(n_mbs, 0);
  chroma_qp_offset.assign(n_mbs, 0);
  i16_mode.assign(n_mbs, 0);
  chroma_mode.assign(n_mbs, 0);
  i4_modes.assign(n_mbs * 16, 0);
  i4_avail.assign(n_mbs * 16, 0);
  mb_avail.assign(n_mbs, 0);
  mv.assign(n_mbs * 32, 0);
  ref_slot.assign(n_mbs * 16, -1);
  nnz.assign(n_mbs * 24, 0);
  nnz_dc.assign(n_mbs * 3, 0);
  mv_min[0] = mv_min[1] = mv_max[0] = mv_max[1] = 0;
  used_slot_mask = 0;
  ipcm_mb.clear();
  ipcm_data.clear();
  // reserve the sparse streams at an I-frame-heavy working set so the
  // first picture never pays vector-growth reallocation
  sparse_id.reserve(n_mbs * 8);
  sparse_level.reserve(size_t(n_mbs) * 8 * 16);
  intra_mbs.reserve(n_mbs);
  intra_payload.reserve(size_t(n_mbs) * 32);
  mv_exc_id.reserve(n_mbs / 4);
  mv_exc_payload.reserve(size_t(n_mbs) * 20);
}

void FrameTensors::clear_picture() {
  std::fill(mb_class.begin(), mb_class.end(), 0);
  std::fill(decoded.begin(), decoded.end(), 0);
  std::fill(slice_id.begin(), slice_id.end(), 0);
  ipcm_mb.clear();
  ipcm_data.clear();
  sparse_id.clear();
  sparse_level.clear();
  intra_mbs.clear();
  intra_payload.clear();
  mv_exc_id.clear();
  mv_exc_payload.clear();
  slice_table.clear();
  mv_min[0] = mv_min[1] = mv_max[0] = mv_max[1] = 0;
  used_slot_mask = 0;
}

void FrameTensors::build_packed() {
  // compact 8-byte per-MB record (AoS, device does the SoA split):
  //   u8 qp | u8 flags(class|disable<<3|avail<<5) |
  //   u8 modes(i16_mode|chroma<<2) | u8 ref_base |
  //   u32 mv_base(x13 | y13<<13) | nnz_dc bits <<26
  // The per-AC-block nnz mask of the former 12-byte record is DERIVED on
  // device from the sparse residual ids (a block has totalCoeff > 0 iff
  // it shipped residual levels; I_PCM MBs — totalCoeff forced to 16 with
  // no residual stream — are OR-ed back in from mb_class).
  // slice-table indices go to the side vector slice_ids, transferred
  // only for multi-slice pictures. Plus: per-slice table (offsets),
  // sparse MV/ref exceptions for the ~6% of MBs with per-block motion,
  // sparse intra mode payloads.
  const u32 n = n_mbs;
  packed.assign(size_t(n) * 8, 0);
  slice_ids.assign(n, 0);
  slice_table.clear();
  mv_exc_id.clear();
  mv_exc_payload.clear();
  intra_mbs.clear();
  intra_payload.clear();

  // map picture slice ids to dense table indices. Entries are seeded from
  // a non-concealed MB of the slice when one exists: concealed MBs carry
  // zeroed offsets (prepare_concealment) that must not leak into the
  // slice's real parameters; the device overrides concealed MBs' offsets
  // to zero itself (unpack_meta).
  std::vector<u16> slice_idx_of;  // indexed by slice_id
  std::vector<bool> slice_seeded_clean;
  auto slice_index = [&](u32 i) -> u16 {
    u32 sid = slice_id[i];
    bool clean = mb_class[i] != kMbConcealed;
    if (sid >= slice_idx_of.size()) {
      slice_idx_of.resize(sid + 1, 0xFFFF);
      slice_seeded_clean.resize(sid + 1, false);
    }
    if (slice_idx_of[sid] == 0xFFFF) {
      slice_idx_of[sid] = u16(slice_table.size() / 4);
      slice_table.push_back(filter_off_a[i]);
      slice_table.push_back(filter_off_b[i]);
      slice_table.push_back(chroma_qp_offset[i]);
      slice_table.push_back(0);
      slice_seeded_clean[sid] = clean;
    } else if (clean && !slice_seeded_clean[sid]) {
      u32 base = u32(slice_idx_of[sid]) * 4;
      slice_table[base + 0] = filter_off_a[i];
      slice_table[base + 1] = filter_off_b[i];
      slice_table[base + 2] = chroma_qp_offset[i];
      slice_seeded_clean[sid] = true;
    }
    return slice_idx_of[sid];
  };

  for (u32 i = 0; i < n; ++i) {
    u8* p = packed.data() + size_t(i) * 8;
    slice_ids[i] = slice_index(i);
    p[0] = qp_y[i];
    // avail bits A|B|D remapped to 3 bits (D: bit 3 -> bit 2)
    u8 av3 = u8((mb_avail[i] & 3) | ((mb_avail[i] >> 3) << 2));
    p[1] = u8(mb_class[i] | (disable_dblk[i] << 3) | (av3 << 5));
    p[2] = u8(i16_mode[i] | (chroma_mode[i] << 2));
    p[3] = u8(ref_slot[i * 16]);
    u32 w1 = (u32(u16(mv[i * 32 + 0])) & 0x1FFF) |
             ((u32(u16(mv[i * 32 + 1])) & 0x1FFF) << 13) |
             (u32(nnz_dc[i * 3 + 0] != 0) << 26) |
             (u32(nnz_dc[i * 3 + 1] != 0) << 27) |
             (u32(nnz_dc[i * 3 + 2] != 0) << 28);
    std::memcpy(p + 4, &w1, 4);

    // QUAD-grained motion exceptions: one 16-byte record per 8x8
    // quadrant whose blocks differ from block 0 (id = mb*4 + q). Most
    // partitioned MBs are 16x8/8x16/8x8 without sub-partitions, so this
    // ships 2-3 quads (32-48 B) instead of the former whole-MB 68 B —
    // the tunnel host->device link is the decode pipeline's scarcest
    // resource. Quads equal to the base MV are NOT emitted (the device's
    // uniform MC pass already covers them).
    const i16* m = &mv[i * 32];
    const i8* r = &ref_slot[i * 16];
    static const u8 kQuadBlocks[4][4] = {
        {0, 1, 4, 5}, {2, 3, 6, 7}, {8, 9, 12, 13}, {10, 11, 14, 15}};
    for (u32 q = 0; q < 4; ++q) {
      bool qdiff = false;
      for (u32 j = 0; j < 4 && !qdiff; ++j) {
        const u32 b = kQuadBlocks[q][j];
        qdiff = m[2 * b] != m[0] || m[2 * b + 1] != m[1] || r[b] != r[0];
      }
      if (!qdiff) continue;
      mv_exc_id.push_back(i * 4 + q);
      u32 blocks[4];
      for (u32 j = 0; j < 4; ++j) {
        const u32 b = kQuadBlocks[q][j];
        blocks[j] = (u32(m[2 * b]) & 0x1FFF) |
                    ((u32(m[2 * b + 1]) & 0x1FFF) << 13) |
                    ((u32(u8(r[b] + 1)) & 0x3F) << 26);
      }
      const u8* pb = reinterpret_cast<const u8*>(blocks);
      mv_exc_payload.insert(mv_exc_payload.end(), pb, pb + 16);
    }

    if (mb_class[i] == kMbIntra4 || mb_class[i] == kMbIntra16) {
      intra_mbs.push_back(i);
      for (u32 b = 0; b < 16; ++b) {
        intra_payload.push_back(
            u8(i4_modes[i * 16 + b] | (i4_avail[i * 16 + b] << 4)));
      }
    }
  }
}

void FrameTensors::classify_sparse() {
  // split the sparse residual stream by payload weight: 65% of 1080p
  // blocks carry ONE coefficient (4 B on the wire instead of 20), ~92%
  // fit the first 8 raster positions (12 B). Out-of-i8 values force the
  // full class, where they travel as wide escapes.
  cls_single.clear();
  cls_short.clear();
  cls_full.clear();
  cls_wide = 0;
  const u32 n_blocks = u32(sparse_id.size());
  for (u32 e = 0; e < n_blocks; ++e) {
    const i16* lv = &sparse_level[size_t(e) * 16];
    u32 nz = 0, last = 0;
    bool narrow = true;
    for (u32 k = 0; k < 16; ++k) {
      if (lv[k]) {
        ++nz;
        last = k;
        narrow &= lv[k] >= -128 && lv[k] <= 127;
      }
    }
    if (nz == 1 && narrow) {
      cls_single.push_back((sparse_id[e] << 12) | (last << 8) |
                           u32(u8(i8(lv[last]))));
    } else if (last < 8 && narrow) {
      cls_short.push_back(e);
    } else {
      cls_full.push_back(e);
      if (!narrow) {
        for (u32 k = 0; k < 16; ++k) {
          cls_wide += lv[k] < -128 || lv[k] > 127;
        }
      }
    }
  }
}

void FrameTensors::build_blob_compact(u32 single_cap, u32 short_cap,
                                      u32 full_cap, u32 wide_cap,
                                      u32 exc_cap, u32 intra_cap,
                                      u32 stab_cap, u32 sid_cap,
                                      u32 total_bytes) {
  // layout (see header comment in mbparse.h; every section 4-aligned):
  //   [0]  16-u32 count header: n_single, n_short, n_full, n_wide,
  //        n_exc, n_intra, n_stab_rows, sid_words, rest 0
  //   [64] packed records n*8 B, then compact sections back-to-back in
  //        DESCENDING cap-size order (exc payload, singles, short
  //        levels, intra payload, full levels, short ids, exc ids,
  //        intra ids, full ids, wide ids, wide values): the device
  //        slices each section at its cap size from the real offset, so
  //        a big-cap section's overrun window must overlap FOLLOWING
  //        real data, not extend the buffer tail — this ordering
  //        minimizes the total the caller must allocate
  //        (ops.unpack.compact_blob_words). Padding entries are NOT
  //        written; the device masks every id stream by its count.
  const u32 n = n_mbs;
  const u32 n_single = std::min(u32(cls_single.size()), single_cap);
  const u32 n_short = std::min(u32(cls_short.size()), short_cap);
  const u32 n_full = std::min(u32(cls_full.size()), full_cap);
  const u32 n_exc = std::min(u32(mv_exc_id.size()), exc_cap);
  const u32 n_intra = std::min(u32(intra_mbs.size()), intra_cap);
  const u32 n_stab =
      std::min(u32(slice_table.size() / 4), stab_cap);
  const u32 sid_words = sid_cap / 2;

  blob.assign(total_bytes, 0);
  u32* hdr = reinterpret_cast<u32*>(blob.data());
  hdr[0] = n_single;
  hdr[1] = n_short;
  hdr[2] = n_full;
  hdr[4] = n_exc;
  hdr[5] = n_intra;
  hdr[6] = n_stab;
  hdr[7] = sid_words;
  u8* p = blob.data() + 64;

  std::memcpy(p, packed.data(), packed.size());
  p += size_t(n) * 8;
  std::memcpy(p, slice_table.data(), size_t(n_stab) * 4);
  p += size_t(n_stab) * 4;
  if (sid_cap) {
    std::memcpy(p, slice_ids.data(), std::min(size_t(n),
                                              size_t(sid_cap)) * 2);
    p += size_t(sid_cap) * 2;
  }

  // exc payload (biggest cap window first; 16 B per quad record)
  std::memcpy(p, mv_exc_payload.data(), size_t(n_exc) * 16);
  p += size_t(n_exc) * 16;

  // singles
  std::memcpy(p, cls_single.data(), size_t(n_single) * 4);
  p += size_t(n_single) * 4;

  // short levels
  i8* sl8 = reinterpret_cast<i8*>(p);
  for (u32 i = 0; i < n_short; ++i) {
    const u32 e = cls_short[i];
    for (u32 k = 0; k < 8; ++k) {
      sl8[i * 8 + k] = i8(sparse_level[size_t(e) * 16 + k]);
    }
  }
  p += size_t(n_short) * 8;

  // intra payload
  std::memcpy(p, intra_payload.data(), size_t(n_intra) * 16);
  p += size_t(n_intra) * 16;

  // full levels (+ collect wide escapes for the tail sections)
  i8* l8 = reinterpret_cast<i8*>(p);
  u32 nw = 0;
  std::vector<u32> wid_buf;
  std::vector<i32> wval_buf;
  for (u32 i = 0; i < n_full; ++i) {
    const u32 e = cls_full[i];
    for (u32 k = 0; k < 16; ++k) {
      const i16 v = sparse_level[size_t(e) * 16 + k];
      if (v >= -128 && v <= 127) {
        l8[i * 16 + k] = i8(v);
      } else if (nw < wide_cap) {
        wid_buf.push_back(i * 16 + k);
        wval_buf.push_back(i32(v));
        ++nw;
      }
    }
  }
  hdr[3] = nw;
  p += size_t(n_full) * 16;

  // short ids
  i32* sids = reinterpret_cast<i32*>(p);
  for (u32 i = 0; i < n_short; ++i) sids[i] = i32(sparse_id[cls_short[i]]);
  p += size_t(n_short) * 4;

  // exc ids
  i32* eids = reinterpret_cast<i32*>(p);
  for (u32 i = 0; i < n_exc; ++i) eids[i] = i32(mv_exc_id[i]);
  p += size_t(n_exc) * 4;

  // intra ids
  i32* iids = reinterpret_cast<i32*>(p);
  for (u32 i = 0; i < n_intra; ++i) iids[i] = i32(intra_mbs[i]);
  p += size_t(n_intra) * 4;

  // full ids
  i32* ids = reinterpret_cast<i32*>(p);
  for (u32 i = 0; i < n_full; ++i) ids[i] = i32(sparse_id[cls_full[i]]);
  p += size_t(n_full) * 4;

  // wide ids + values
  i32* wids = reinterpret_cast<i32*>(p);
  for (u32 i = 0; i < nw; ++i) wids[i] = i32(wid_buf[i]);
  p += size_t(nw) * 4;
  i32* wvals = reinterpret_cast<i32*>(p);
  for (u32 i = 0; i < nw; ++i) wvals[i] = wval_buf[i];
}

void MbParser::configure(u32 width_mbs, u32 height_mbs) {
  width_mbs_ = width_mbs;
  height_mbs_ = height_mbs;
  n_mbs_ = width_mbs * height_mbs;
  mbs_.assign(n_mbs_, HostMb());
}

void MbParser::reset_picture(FrameTensors* out) {
  for (HostMb& m : mbs_) {
    m.slice_id = 0;
    m.decoded = 0;
  }
  if (out) out->clear_picture();
}

const HostMb* MbParser::nbr_mb(u32 addr, int which) const {
  // reference h264bsdInitMbNeighbours neighbour.c:106-158
  u32 row = addr / width_mbs_, col = addr % width_mbs_;
  switch (which) {
    case NB_A: return col ? &mbs_[addr - 1] : nullptr;
    case NB_B: return row ? &mbs_[addr - width_mbs_] : nullptr;
    case NB_C:
      return (row && col < width_mbs_ - 1) ? &mbs_[addr - width_mbs_ + 1]
                                           : nullptr;
    case NB_D: return (row && col) ? &mbs_[addr - width_mbs_ - 1] : nullptr;
    default: return nullptr;
  }
}

bool MbParser::nbr_available(const HostMb* n, u32 slice_id) const {
  // reference h264bsdIsNeighbourAvailable neighbour.c:350-383
  return n != nullptr && n->slice_id == slice_id;
}

i32 MbParser::determine_nc(u32 addr, u32 slice_id, u32 block,
                           const i16* cur_tc) const {
  // reference DetermineNc macroblock_layer.c:810-870
  const NbRef& na = kNb.a[block];
  const NbRef& nb = kNb.b[block];
  if (na.mb == NB_CURR && nb.mb == NB_CURR) {
    return (cur_tc[na.index] + cur_tc[nb.index] + 1) >> 1;
  }
  const HostMb* mb_a = nbr_mb(addr, NB_A);
  const HostMb* mb_b = nbr_mb(addr, NB_B);
  if (na.mb == NB_CURR) {
    i32 n = cur_tc[na.index];
    if (nbr_available(mb_b, slice_id)) {
      n = (n + mb_b->total_coeff[nb.index] + 1) >> 1;
    }
    return n;
  }
  if (nb.mb == NB_CURR) {
    i32 n = cur_tc[nb.index];
    if (nbr_available(mb_a, slice_id)) {
      n = (n + mb_a->total_coeff[na.index] + 1) >> 1;
    }
    return n;
  }
  i32 n = 0;
  bool got_a = false;
  if (nbr_available(mb_a, slice_id)) {
    n = mb_a->total_coeff[na.index];
    got_a = true;
  }
  if (nbr_available(mb_b, slice_id)) {
    n = got_a ? (n + mb_b->total_coeff[nb.index] + 1) >> 1
              : mb_b->total_coeff[nb.index];
  }
  return n;
}

Status MbParser::parse_residual(BitReader& br, u32 addr, u32 slice_id,
                                u32 mb_type, u32 cbp, i16 levels[27][16],
                                u16 coeff_maps[24], i16 total_coeff[27],
                                u32 abs_sums[27]) {
  // reference DecodeResidual macroblock_layer.c:700-796 (C path)
  const bool is16 = mb_is_i16(mb_type);
  CavlcResult res;

  if (is16) {
    i32 nc = determine_nc(addr, slice_id, 0, total_coeff);
    if (!ok(decode_residual_block(br, nc, 16, levels[24], &res))) {
      return Status::kError;
    }
    total_coeff[24] = i16(res.total_coeff);
    abs_sums[24] = res.abs_sum;
  }

  u32 block = 0;
  for (u32 group = 0; group < 4; ++group) {
    if (cbp & (1u << group)) {
      for (u32 j = 0; j < 4; ++j, ++block) {
        i32 nc = determine_nc(addr, slice_id, block, total_coeff);
        Status s;
        if (is16) {
          s = decode_residual_block(br, nc, 15, levels[block] + 1, &res);
          coeff_maps[block] = u16(res.coeff_map << 1);
        } else {
          s = decode_residual_block(br, nc, 16, levels[block], &res);
          coeff_maps[block] = res.coeff_map;
        }
        if (!ok(s)) return Status::kError;
        total_coeff[block] = i16(res.total_coeff);
        abs_sums[block] = res.abs_sum;
      }
    } else {
      block += 4;
    }
  }

  if (cbp & 0x30) {
    for (u32 i = 0; i < 2; ++i) {
      if (!ok(decode_residual_block(br, -1, 4, levels[25 + i], &res))) {
        return Status::kError;
      }
      total_coeff[25 + i] = i16(res.total_coeff);
      abs_sums[25 + i] = res.abs_sum;
    }
  }

  if (cbp & 0x20) {
    for (block = 16; block < 24; ++block) {
      i32 nc = determine_nc(addr, slice_id, block, total_coeff);
      if (!ok(decode_residual_block(br, nc, 15, levels[block] + 1, &res))) {
        return Status::kError;
      }
      total_coeff[block] = i16(res.total_coeff);
      abs_sums[block] = res.abs_sum;
      coeff_maps[block] = u16(res.coeff_map << 1);
    }
  }
  return Status::kOk;
}

Status MbParser::residual_range_check(const i16 levels[27][16],
                                      const i16 total_coeff[27],
                                      const u32 abs_sums[27], u32 mb_type,
                                      u32 qp_y,
                                      i32 chroma_qp_index_offset) const {
  // Replicates the [-512,511] IDCT range validation of the reference
  // (h264bsdProcessBlock transform.c:97-233, driven by ProcessResidual
  // macroblock_layer.c:1340-1421) for error-path parity. The pixel IDCT
  // itself runs on device; here a conservative magnitude bound screens out
  // blocks that cannot overflow, and the exact integer transform is only
  // evaluated when the bound is exceeded (rare: large levels at high QP).
  const bool is16 = mb_is_i16(mb_type);

  i32 luma_dc[16];
  if (is16 && total_coeff[24]) {
    // h264bsdProcessLumaDc transform.c:255-338 (scan order input)
    i32 d[16];
    for (u32 i = 0; i < 16; ++i) d[kScan2Ras[i]] = levels[24][i];
    i32 t[16];
    for (u32 r = 0; r < 4; ++r) {
      i32 t0 = d[4 * r + 0] + d[4 * r + 2];
      i32 t1 = d[4 * r + 0] - d[4 * r + 2];
      i32 t2 = d[4 * r + 1] - d[4 * r + 3];
      i32 t3 = d[4 * r + 1] + d[4 * r + 3];
      t[4 * r + 0] = t0 + t3;
      t[4 * r + 1] = t1 + t2;
      t[4 * r + 2] = t1 - t2;
      t[4 * r + 3] = t0 - t3;
    }
    u32 qp_div = qp_y / 6;
    i32 lev = kLevelScale[qp_y % 6][0];
    for (u32 c = 0; c < 4; ++c) {
      i32 t0 = t[c] + t[c + 8];
      i32 t1 = t[c] - t[c + 8];
      i32 t2 = t[c + 4] - t[c + 12];
      i32 t3 = t[c + 4] + t[c + 12];
      i32 o0 = t0 + t3, o1 = t1 + t2, o2 = t1 - t2, o3 = t0 - t3;
      if (qp_y >= 12) {
        i32 ls = lev << (qp_div - 2);
        luma_dc[c] = o0 * ls; luma_dc[c + 4] = o1 * ls;
        luma_dc[c + 8] = o2 * ls; luma_dc[c + 12] = o3 * ls;
      } else {
        i32 rnd = (1 - i32(qp_div)) == 0 ? 1 : 2;
        u32 sh = 2 - qp_div;
        luma_dc[c] = (o0 * lev + rnd) >> sh; luma_dc[c + 4] = (o1 * lev + rnd) >> sh;
        luma_dc[c + 8] = (o2 * lev + rnd) >> sh; luma_dc[c + 12] = (o3 * lev + rnd) >> sh;
      }
    }
  } else {
    std::memset(luma_dc, 0, sizeof(luma_dc));
  }

  u32 chroma_qp = kQpC[std::min(std::max(i32(qp_y) + chroma_qp_index_offset, 0), 51)];
  i32 chroma_dc[8];
  if (total_coeff[25] || total_coeff[26]) {
    // h264bsdProcessChromaDc transform.c:359-401
    u32 qp_div = chroma_qp / 6;
    i32 lev = kLevelScale[chroma_qp % 6][0];
    u32 shift = chroma_qp >= 6 ? 0 : 1;
    if (chroma_qp >= 6) lev <<= (qp_div - 1);
    for (u32 half = 0; half < 2; ++half) {
      const i16* d = levels[25 + half];
      i32 t0 = d[0] + d[2], t1 = d[0] - d[2];
      i32 t2 = d[1] - d[3], t3 = d[1] + d[3];
      chroma_dc[4 * half + 0] = ((t0 + t3) * lev) >> shift;
      chroma_dc[4 * half + 1] = ((t0 - t3) * lev) >> shift;
      chroma_dc[4 * half + 2] = ((t1 + t2) * lev) >> shift;
      chroma_dc[4 * half + 3] = ((t1 - t2) * lev) >> shift;
    }
  } else {
    std::memset(chroma_dc, 0, sizeof(chroma_dc));
  }

  // exact per-block check (scan-order input + external dc when skip_dc)
  auto check_block = [](const i16* scan, i32 dc, bool skip_dc, u32 qp) {
    i32 d[16];
    u32 qp_div = qp / 6;
    i32 s0 = kLevelScale[qp % 6][0] << qp_div;
    i32 s1 = kLevelScale[qp % 6][1] << qp_div;
    i32 s2 = kLevelScale[qp % 6][2] << qp_div;
    const i32 scale[3] = {s0, s1, s2};
    for (u32 i = 0; i < 16; ++i) {
      u32 r = kScan2Ras[i];
      d[r] = i32(scan[i]) * scale[kScaleIdx[r]];
    }
    if (skip_dc) d[0] = dc; else d[0] = i32(scan[0]) * s0;
    for (u32 r = 0; r < 4; ++r) {
      i32 t0 = d[4 * r + 0] + d[4 * r + 2];
      i32 t1 = d[4 * r + 0] - d[4 * r + 2];
      i32 t2 = (d[4 * r + 1] >> 1) - d[4 * r + 3];
      i32 t3 = d[4 * r + 1] + (d[4 * r + 3] >> 1);
      d[4 * r + 0] = t0 + t3; d[4 * r + 1] = t1 + t2;
      d[4 * r + 2] = t1 - t2; d[4 * r + 3] = t0 - t3;
    }
    for (u32 c = 0; c < 4; ++c) {
      i32 t0 = d[c] + d[c + 8];
      i32 t1 = d[c] - d[c + 8];
      i32 t2 = (d[c + 4] >> 1) - d[c + 12];
      i32 t3 = d[c + 4] + (d[c + 12] >> 1);
      i32 o0 = (t0 + t3 + 32) >> 6, o1 = (t1 + t2 + 32) >> 6;
      i32 o2 = (t1 - t2 + 32) >> 6, o3 = (t0 - t3 + 32) >> 6;
      if (u32(o0 + 512) > 1023 || u32(o1 + 512) > 1023 ||
          u32(o2 + 512) > 1023 || u32(o3 + 512) > 1023) {
        return false;
      }
    }
    return true;
  };

  auto screen = [](const i16* scan, i32 dc, bool skip_dc, u32 qp) {
    // |IDCT out| <= (sum of |dequantized coeffs| + 32) >> 6; see each 1D
    // butterfly: every output magnitude is bounded by the input L1 norm.
    u32 qp_div = qp / 6;
    i64 sum = skip_dc ? (dc < 0 ? -i64(dc) : i64(dc)) : 0;
    for (u32 i = skip_dc ? 1 : 0; i < 16; ++i) {
      u32 r = kScan2Ras[i];
      i32 v = scan[i];
      sum += i64(v < 0 ? -v : v) * (kLevelScale[qp % 6][kScaleIdx[r]] << qp_div);
    }
    return sum + 32 <= 511 * 64;
  };

  // O(1) pre-screen: |IDCT out| <= (L1 of dequantized inputs + 32) >> 6
  // and every per-position scale is <= the per-QP max scale, so
  // abs_sum * smax (+ |external dc|) bounds the exact per-position L1.
  const i32 kBound = 511 * 64 - 32;
  auto smax_of = [](u32 qp) {
    const i32* row = kLevelScale[qp % 6];
    i32 m = row[0] > row[1] ? row[0] : row[1];
    if (row[2] > m) m = row[2];
    return m << (qp / 6);
  };
  const i64 smax_y = smax_of(qp_y);
  const i64 smax_c = smax_of(chroma_qp);

  static const i16 kZero16[16] = {};
  if (is16) {
    for (u32 z = 0; z < 16; ++z) {
      i32 dc = luma_dc[kZig2Ras[z]];
      const i16* scan = total_coeff[z] ? levels[z] : kZero16;
      if (dc || total_coeff[z]) {
        i64 adc = dc < 0 ? -i64(dc) : i64(dc);
        if (i64(abs_sums[z]) * smax_y + adc <= kBound) continue;
        if (!screen(scan, dc, true, qp_y) && !check_block(scan, dc, true, qp_y)) {
          return Status::kError;
        }
      }
    }
  } else {
    for (u32 z = 0; z < 16; ++z) {
      if (total_coeff[z]) {
        if (i64(abs_sums[z]) * smax_y <= kBound) continue;
        if (!screen(levels[z], 0, false, qp_y) &&
            !check_block(levels[z], 0, false, qp_y)) {
          return Status::kError;
        }
      }
    }
  }
  for (u32 b = 16; b < 24; ++b) {
    i32 dc = chroma_dc[b - 16];
    const i16* scan = total_coeff[b] ? levels[b] : kZero16;
    if (dc || total_coeff[b]) {
      i64 adc = dc < 0 ? -i64(dc) : i64(dc);
      if (i64(abs_sums[b]) * smax_c + adc <= kBound) continue;
      if (!screen(scan, dc, true, chroma_qp) &&
          !check_block(scan, dc, true, chroma_qp)) {
        return Status::kError;
      }
    }
  }
  return Status::kOk;
}

Status MbParser::mv_prediction(u32 addr, u32 slice_id, u32 mb_type,
                               const u32 ref_idx[4], const i16 mvd[16][2],
                               const u8 sub_types[4], const Dpb& dpb,
                               HostMb* cur) {
  // Host-side equivalent of the MV-prediction half of
  // h264bsdInterPrediction (reference inter_prediction.c:361-918).
  const HostMb* nbs[4] = {nbr_mb(addr, NB_A), nbr_mb(addr, NB_B),
                          nbr_mb(addr, NB_C), nbr_mb(addr, NB_D)};

  auto get_nb = [&](const HostMb* n, u32 index, InterNb* out) {
    // reference GetInterNeighbour inter_prediction.c:963-996
    out->available = false;
    out->ref_index = 0xFFFFFFFFu;
    out->mv[0] = out->mv[1] = 0;
    if (n && n->slice_id == slice_id) {
      out->available = true;
      if (mb_is_inter(n->mb_type)) {
        out->mv[0] = n->mv[index][0];
        out->mv[1] = n->mv[index][1];
        out->ref_index = n->ref_pic[index >> 2];
      }
    }
  };

  auto set_slot = [&](u32 part, u32 ref) -> bool {
    i32 slot = dpb.ref_pic_slot(ref);
    if (slot < 0) return false;
    cur->ref_pic[part] = u8(ref);
    cur->ref_slot[part] = i8(slot);
    return true;
  };

  InterNb a[3];
  i16 mv[2];
  i16 pred[2];

  switch (mb_type) {
    case kPSkip:
    case kP16x16: {
      u32 ref = ref_idx[0];
      get_nb(nbs[NB_A], 5, &a[0]);
      get_nb(nbs[NB_B], 10, &a[1]);
      bool a0_zero = a[0].mv[0] == 0 && a[0].mv[1] == 0;
      bool a1_zero = a[1].mv[0] == 0 && a[1].mv[1] == 0;
      if (mb_type == kPSkip &&
          (!a[0].available || !a[1].available ||
           (a[0].ref_index == 0 && a0_zero) ||
           (a[1].ref_index == 0 && a1_zero))) {
        mv[0] = mv[1] = 0;
      } else {
        get_nb(nbs[NB_C], 10, &a[2]);
        if (!a[2].available) get_nb(nbs[NB_D], 15, &a[2]);
        prediction_mv(pred, a, ref);
        mv[0] = i16(mvd[0][0] + pred[0]);
        mv[1] = i16(mvd[0][1] + pred[1]);
        if (!mv_in_range(mv[0], mv[1])) return Status::kError;
      }
      for (u32 p = 0; p < 4; ++p) {
        if (!set_slot(p, ref)) return Status::kError;
      }
      for (u32 z = 0; z < 16; ++z) {
        cur->mv[z][0] = mv[0];
        cur->mv[z][1] = mv[1];
      }
      return Status::kOk;
    }

    case kP16x8: {
      // upper partition: prefer B's MV when B has the same reference
      u32 ref = ref_idx[0];
      get_nb(nbs[NB_B], 10, &a[1]);
      if (a[1].ref_index == ref) {
        pred[0] = a[1].mv[0]; pred[1] = a[1].mv[1];
      } else {
        get_nb(nbs[NB_A], 5, &a[0]);
        get_nb(nbs[NB_C], 10, &a[2]);
        if (!a[2].available) get_nb(nbs[NB_D], 15, &a[2]);
        prediction_mv(pred, a, ref);
      }
      mv[0] = i16(mvd[0][0] + pred[0]);
      mv[1] = i16(mvd[0][1] + pred[1]);
      if (!mv_in_range(mv[0], mv[1])) return Status::kError;
      if (!set_slot(0, ref) || !set_slot(1, ref)) return Status::kError;
      for (u32 z = 0; z < 8; ++z) { cur->mv[z][0] = mv[0]; cur->mv[z][1] = mv[1]; }

      // lower partition: prefer A's MV when A has the same reference
      ref = ref_idx[1];
      get_nb(nbs[NB_A], 13, &a[0]);
      if (a[0].ref_index == ref) {
        pred[0] = a[0].mv[0]; pred[1] = a[0].mv[1];
      } else {
        a[1].available = true;
        a[1].ref_index = cur->ref_pic[0];
        a[1].mv[0] = cur->mv[0][0]; a[1].mv[1] = cur->mv[0][1];
        get_nb(nbs[NB_A], 7, &a[2]);  // C unavailable -> D (left-above)
        prediction_mv(pred, a, ref);
      }
      mv[0] = i16(mvd[1][0] + pred[0]);
      mv[1] = i16(mvd[1][1] + pred[1]);
      if (!mv_in_range(mv[0], mv[1])) return Status::kError;
      if (!set_slot(2, ref) || !set_slot(3, ref)) return Status::kError;
      for (u32 z = 8; z < 16; ++z) { cur->mv[z][0] = mv[0]; cur->mv[z][1] = mv[1]; }
      return Status::kOk;
    }

    case kP8x16: {
      // left partition: prefer A's MV when A has the same reference
      u32 ref = ref_idx[0];
      get_nb(nbs[NB_A], 5, &a[0]);
      if (a[0].ref_index == ref) {
        pred[0] = a[0].mv[0]; pred[1] = a[0].mv[1];
      } else {
        get_nb(nbs[NB_B], 10, &a[1]);
        get_nb(nbs[NB_B], 14, &a[2]);
        if (!a[2].available) get_nb(nbs[NB_D], 15, &a[2]);
        prediction_mv(pred, a, ref);
      }
      mv[0] = i16(mvd[0][0] + pred[0]);
      mv[1] = i16(mvd[0][1] + pred[1]);
      if (!mv_in_range(mv[0], mv[1])) return Status::kError;
      if (!set_slot(0, ref) || !set_slot(2, ref)) return Status::kError;
      static const u8 left_blocks[8] = {0, 1, 2, 3, 8, 9, 10, 11};
      for (u8 z : left_blocks) { cur->mv[z][0] = mv[0]; cur->mv[z][1] = mv[1]; }

      // right partition: prefer C's (or its fallback's) MV on match
      ref = ref_idx[1];
      get_nb(nbs[NB_C], 10, &a[2]);
      if (!a[2].available) get_nb(nbs[NB_B], 11, &a[2]);
      if (a[2].ref_index == ref) {
        pred[0] = a[2].mv[0]; pred[1] = a[2].mv[1];
      } else {
        a[0].available = true;
        a[0].ref_index = cur->ref_pic[0];
        a[0].mv[0] = cur->mv[0][0]; a[0].mv[1] = cur->mv[0][1];
        get_nb(nbs[NB_B], 14, &a[1]);
        prediction_mv(pred, a, ref);
      }
      mv[0] = i16(mvd[1][0] + pred[0]);
      mv[1] = i16(mvd[1][1] + pred[1]);
      if (!mv_in_range(mv[0], mv[1])) return Status::kError;
      if (!set_slot(1, ref) || !set_slot(3, ref)) return Status::kError;
      static const u8 right_blocks[8] = {4, 5, 6, 7, 12, 13, 14, 15};
      for (u8 z : right_blocks) { cur->mv[z][0] = mv[0]; cur->mv[z][1] = mv[1]; }
      return Status::kOk;
    }

    default: {  // P_8x8 / P_8x8ref0 (reference MvPrediction8x8 + MvPrediction)
      for (u32 p = 0; p < 4; ++p) {
        if (!set_slot(p, ref_idx[p])) return Status::kError;
        u32 mode = sub_types[p];
        u32 n_sub = num_sub_mb_part(mode);
        for (u32 s = 0; s < n_sub; ++s) {
          auto fetch = [&](const NbRef& nr, InterNb* out) {
            const HostMb* n = nr.mb == NB_CURR
                                  ? cur
                                  : (nr.mb <= NB_D ? nbs[nr.mb] : nullptr);
            get_nb(n, nr.index, out);
          };
          fetch(kSubNb.a[p][mode][s], &a[0]);
          fetch(kSubNb.b[p][mode][s], &a[1]);
          fetch(kSubNb.c[p][mode][s], &a[2]);
          if (!a[2].available) fetch(kSubNb.d[p][mode][s], &a[2]);
          prediction_mv(pred, a, ref_idx[p]);
          const i16* d = mvd[p * 4 + s];
          mv[0] = i16(d[0] + pred[0]);
          mv[1] = i16(d[1] + pred[1]);
          if (!mv_in_range(mv[0], mv[1])) return Status::kError;
          // scatter into the zigzag-ordered per-4x4 mv array
          switch (mode) {
            case 0:
              for (u32 k = 0; k < 4; ++k) {
                cur->mv[4 * p + k][0] = mv[0]; cur->mv[4 * p + k][1] = mv[1];
              }
              break;
            case 1:  // 8x4
              cur->mv[4 * p + 2 * s][0] = mv[0]; cur->mv[4 * p + 2 * s][1] = mv[1];
              cur->mv[4 * p + 2 * s + 1][0] = mv[0]; cur->mv[4 * p + 2 * s + 1][1] = mv[1];
              break;
            case 2:  // 4x8
              cur->mv[4 * p + s][0] = mv[0]; cur->mv[4 * p + s][1] = mv[1];
              cur->mv[4 * p + s + 2][0] = mv[0]; cur->mv[4 * p + s + 2][1] = mv[1];
              break;
            default:
              cur->mv[4 * p + s][0] = mv[0]; cur->mv[4 * p + s][1] = mv[1];
              break;
          }
        }
      }
      return Status::kOk;
    }
  }
}

void MbParser::emit_mb(u32 addr, const SliceContext& ctx, const HostMb& cur,
                       u32 mb_class, const i16 levels[27][16],
                       const u16 coeff_maps[24], const u8 i4_avail[16],
                       u8 avail, u8 i16_mode, u8 chroma_mode,
                       FrameTensors* out) const {
  out->mb_class[addr] = u8(mb_class);
  out->qp_y[addr] = cur.qp_y;
  out->slice_id[addr] = cur.slice_id;
  out->decoded[addr] = cur.decoded;
  out->disable_dblk[addr] = u8(ctx.sh->disable_deblocking_filter_idc);
  out->filter_off_a[addr] = i8(ctx.sh->slice_alpha_c0_offset);
  out->filter_off_b[addr] = i8(ctx.sh->slice_beta_offset);
  out->chroma_qp_offset[addr] = i8(ctx.pps->chroma_qp_index_offset);
  out->i16_mode[addr] = i16_mode;
  out->chroma_mode[addr] = chroma_mode;
  out->mb_avail[addr] = avail;

  // raster-major loop: kZig2Ras is an involution, so iterating the
  // raster index r with zigzag z = kZig2Ras[r] turns five scattered
  // write streams into sequential ones (the reads stay in L1)
  u8* nnz = &out->nnz[addr * 24];
  u8* modes = &out->i4_modes[addr * 16];
  u8* availv = &out->i4_avail[addr * 16];
  i16* mvout = &out->mv[addr * 32];
  i8* refout = &out->ref_slot[addr * 16];
  for (u32 r = 0; r < 16; ++r) {
    u32 z = kZig2Ras[r];
    nnz[r] = u8(cur.total_coeff[z]);
    modes[r] = cur.intra4_modes[z];
    availv[r] = i4_avail ? i4_avail[z] : 0;
    mvout[2 * r + 0] = cur.mv[z][0];
    mvout[2 * r + 1] = cur.mv[z][1];
    refout[r] = cur.ref_slot[z >> 2];
    if (cur.ref_slot[z >> 2] >= 0 && cur.ref_slot[z >> 2] < 32) {
      out->used_slot_mask |= 1u << cur.ref_slot[z >> 2];
    }
    for (u32 c = 0; c < 2; ++c) {
      i32 v = cur.mv[z][c];
      if (v < out->mv_min[c]) out->mv_min[c] = v;
      if (v > out->mv_max[c]) out->mv_max[c] = v;
    }
  }
  for (u32 b = 16; b < 24; ++b) nnz[b] = u8(cur.total_coeff[b]);
  out->nnz_dc[addr * 3 + 0] = u8(cur.total_coeff[24]);
  out->nnz_dc[addr * 3 + 1] = u8(cur.total_coeff[25]);
  out->nnz_dc[addr * 3 + 2] = u8(cur.total_coeff[26]);

  if (mb_class == kMbSkip || mb_class == kMbIpcm || levels == nullptr) {
    return;  // no residual; device masks on nnz/mb_class
  }

  // residuals go out sparse-only; the dense (nMB,24,16) view used by the
  // parity tests is synthesized from the sparse stream in the binding
  const bool is16 = mb_class == kMbIntra16;
  auto sparse_push = [&](u32 b, const i16* vals) {
    out->sparse_id.push_back(addr * 26 + b);
    out->sparse_level.insert(out->sparse_level.end(), vals, vals + 16);
  };
  i16 blk[16];
  // the coefficient bitmaps from CAVLC let the scan->raster scatter touch
  // only the non-zero positions (typically 2-5 of 16)
  for (u32 z = 0; z < 16; ++z) {
    if (!cur.total_coeff[z]) continue;
    std::memset(blk, 0, sizeof(blk));
    const i16* src = levels[z];
    for (u32 m = coeff_maps[z]; m; m &= m - 1) {
      u32 s = u32(__builtin_ctz(m));
      blk[kScan2Ras[s]] = src[s];
    }
    sparse_push(kZig2Ras[z], blk);
  }
  for (u32 b = 16; b < 24; ++b) {
    if (!cur.total_coeff[b]) continue;
    std::memset(blk, 0, sizeof(blk));
    const i16* src = levels[b];
    for (u32 m = coeff_maps[b]; m; m &= m - 1) {
      u32 s = u32(__builtin_ctz(m));
      blk[kScan2Ras[s]] = src[s];
    }
    sparse_push(b, blk);
  }
  if (is16 && cur.total_coeff[24]) {
    std::memset(blk, 0, sizeof(blk));
    for (u32 s = 0; s < 16; ++s) blk[kScan2Ras[s]] = levels[24][s];
    sparse_push(24, blk);
  }
  bool any_cdc = false;
  for (u32 i = 0; i < 4; ++i) {
    any_cdc |= levels[25][i] != 0;
    any_cdc |= levels[26][i] != 0;
  }
  if (any_cdc) {
    std::memset(blk, 0, sizeof(blk));
    std::memcpy(blk, levels[25], 4 * sizeof(i16));
    std::memcpy(blk + 4, levels[26], 4 * sizeof(i16));
    sparse_push(25, blk);
  }
}

Status MbParser::parse_macroblock(BitReader& br, SliceContext& ctx, u32 addr,
                                  const Dpb& dpb, FrameTensors* out,
                                  bool skipped) {
  // Combines the parse half (h264bsdDecodeMacroblockLayer,
  // macroblock_layer.c:134-243) with the state/derivation half of
  // h264bsdDecodeMacroblock (:965-1131) minus pixel work.
  HostMb& cur = mbs_[addr];
  const u32 slice_id = ctx.slice_id;

  u32 mb_type;
  if (skipped) {
    mb_type = kPSkip;
  } else {
    u32 value;
    if (!ok(br.ue(&value))) { MBDBG("err: mbtype ue mb=%u\n", addr); return Status::kError; }
    if (ctx.is_intra) {
      if (value + 6 > 31) return Status::kError;
      mb_type = value + 6;
    } else {
      if (value + 1 > 31) return Status::kError;
      mb_type = value + 1;
    }
  }

  cur.mb_type = u8(mb_type);
  cur.decoded++;

  if (mb_type == kIPcm) {
    while (!br.byte_aligned()) {
      if (br.get_bits(1) != 0) return Status::kError;  // alignment must be 0
    }
    u8 pcm[384];
    for (u32 i = 0; i < 384; ++i) {
      u32 v = br.get_bits(8);
      if (v == kEndOfStream) return Status::kError;
      pcm[i] = u8(v);
    }
    for (u32 i = 0; i < 24; ++i) cur.total_coeff[i] = 16;
    cur.total_coeff[24] = cur.total_coeff[25] = cur.total_coeff[26] = 0;
    cur.qp_y = 0;
    if (cur.decoded == 1) {
      out->ipcm_mb.push_back(addr);
      out->ipcm_data.insert(out->ipcm_data.end(), pcm, pcm + 384);
    }
    emit_mb(addr, ctx, cur, kMbIpcm, nullptr, nullptr, nullptr, 0, 0, 0, out);
    return Status::kOk;
  }

  // ---- prediction syntax ----
  u32 ref_idx[4] = {0, 0, 0, 0};
  i16 mvd[16][2] = {};
  u8 sub_types[4] = {0, 0, 0, 0};
  bool prev_flag[16];
  u8 rem_mode[16];
  u8 chroma_mode = 0;
  u32 cbp = 0;

  const bool inter = mb_is_inter(mb_type);
  if (inter && mb_type != kPSkip) {
    if (num_mb_part(mb_type) == 4) {
      // reference DecodeSubMbPred macroblock_layer.c:442-497
      for (u32 i = 0; i < 4; ++i) {
        u32 value;
        if (!ok(br.ue(&value)) || value > 3) return Status::kError;
        sub_types[i] = u8(value);
      }
      if (ctx.sh->num_ref_idx_l0_active > 1 && mb_type != kP8x8ref0) {
        for (u32 i = 0; i < 4; ++i) {
          u32 value;
          if (!ok(br.te(&value, ctx.sh->num_ref_idx_l0_active > 2)) ||
              value >= ctx.sh->num_ref_idx_l0_active) {
            return Status::kError;
          }
          ref_idx[i] = value;
        }
      }
      for (u32 i = 0; i < 4; ++i) {
        for (u32 j = 0; j < num_sub_mb_part(sub_types[i]); ++j) {
          i32 h, v;
          if (!ok(br.se(&h)) || !ok(br.se(&v))) { MBDBG("err: sub mvd mb=%u\n", addr); return Status::kError; }
          mvd[i * 4 + j][0] = i16(h);
          mvd[i * 4 + j][1] = i16(v);
        }
      }
    } else {
      // reference DecodeMbPred inter branch macroblock_layer.c:369-396
      u32 n_part = num_mb_part(mb_type);
      if (ctx.sh->num_ref_idx_l0_active > 1) {
        for (u32 i = 0; i < n_part; ++i) {
          u32 value;
          if (!ok(br.te(&value, ctx.sh->num_ref_idx_l0_active > 2)) ||
              value >= ctx.sh->num_ref_idx_l0_active) {
            return Status::kError;
          }
          ref_idx[i] = value;
        }
      }
      for (u32 i = 0; i < n_part; ++i) {
        i32 h, v;
        if (!ok(br.se(&h)) || !ok(br.se(&v))) { MBDBG("err: mvd mb=%u\n", addr); return Status::kError; }
        mvd[i][0] = i16(h);
        mvd[i][1] = i16(v);
      }
    }
  } else if (!inter) {
    if (mb_is_i4(mb_type)) {
      for (u32 i = 0; i < 16; ++i) {
        u32 bit = br.get_bits(1);
        if (bit == kEndOfStream) return Status::kError;
        prev_flag[i] = bit != 0;
        if (!prev_flag[i]) {
          u32 rem = br.get_bits(3);
          if (rem == kEndOfStream) return Status::kError;
          rem_mode[i] = u8(rem);
        } else {
          rem_mode[i] = 0;
        }
      }
    }
    u32 value;
    if (!ok(br.ue(&value)) || value > 3) return Status::kError;
    chroma_mode = u8(value);
  }

  // ---- coded block pattern ----
  u8 i16_mode = 0;
  if (mb_is_i16(mb_type)) {
    // reference CbpIntra16x16 :881 and h264bsdPredModeIntra16x16 :920
    u32 t = mb_type - kI16x16Base;
    i16_mode = u8(t & 3);
    u32 chroma_cbp = (t >> 2) % 3;
    cbp = (t >= 12 ? 15u : 0u) | (chroma_cbp << 4);
  } else if (mb_type != kPSkip) {
    if (!ok(decode_cbp(br, !inter, &cbp))) { MBDBG("err: cbp mb=%u type=%u\n", addr, mb_type); return Status::kError; }
  }

  // ---- residual + qp ----
  i16 levels[27][16];
  u16 coeff_maps[24] = {};
  i16 total_coeff[27] = {};
  u32 abs_sums[27] = {};
  bool has_residual = cbp != 0 || mb_is_i16(mb_type);
  if (has_residual) {
    std::memset(levels, 0, sizeof(levels));
    i32 qp_delta;
    if (!ok(br.se(&qp_delta)) || qp_delta < -26 || qp_delta > 25) {
      MBDBG("err: qp_delta mb=%u\n", addr);
      return Status::kError;
    }
    if (!ok(parse_residual(br, addr, slice_id, mb_type, cbp, levels,
                           coeff_maps, total_coeff, abs_sums))) {
      MBDBG("err: residual mb=%u type=%u cbp=%u\n", addr, mb_type, cbp);
      return Status::kError;
    }
    if (qp_delta) {
      ctx.qp_y += qp_delta;
      if (ctx.qp_y < 0) ctx.qp_y += 52;
      else if (ctx.qp_y >= 52) ctx.qp_y -= 52;
    }
  } else {
    std::memset(levels, 0, sizeof(levels));
  }

  if (mb_type != kPSkip) {
    std::memcpy(cur.total_coeff, total_coeff, sizeof(total_coeff));
    cur.qp_y = u8(ctx.qp_y);
    // IDCT range validation for error-path parity (the reference fails the
    // slice when any transformed residual leaves [-512,511])
    if (has_residual &&
        !ok(residual_range_check(levels, total_coeff, abs_sums, mb_type,
                                 cur.qp_y,
                                 ctx.pps->chroma_qp_index_offset))) {
      MBDBG("err: range_check mb=%u type=%u qp=%u\n", addr, mb_type, cur.qp_y);
      return Status::kError;
    }
  } else {
    std::memset(cur.total_coeff, 0, sizeof(cur.total_coeff));
    cur.qp_y = u8(ctx.qp_y);
  }

  // ---- intra mode resolution / inter MV prediction ----
  u8 i4_avail[16] = {};
  u8 avail = 0;
  if (!inter) {
    const HostMb* nbs[4] = {nbr_mb(addr, NB_A), nbr_mb(addr, NB_B),
                            nbr_mb(addr, NB_C), nbr_mb(addr, NB_D)};
    bool constrained = ctx.pps->constrained_intra_pred;
    auto pel_avail = [&](const HostMb* n) {
      return nbr_available(n, slice_id) &&
             !(constrained && mb_is_inter(n->mb_type));
    };
    bool av_a = pel_avail(nbs[NB_A]);
    bool av_b = pel_avail(nbs[NB_B]);
    bool av_d = pel_avail(nbs[NB_D]);
    avail = (av_a ? kAvailA : 0) | (av_b ? kAvailB : 0) | (av_d ? kAvailD : 0);

    if (mb_is_i4(mb_type)) {
      // per-block mode inference + availability, reference
      // h264bsdIntra4x4Prediction :701-833 + DetermineIntra4x4PredMode :194
      for (u32 z = 0; z < 16; ++z) {
        auto block_nb = [&](const NbRef& nr) -> const HostMb* {
          return nr.mb == NB_CURR ? &cur : (nr.mb <= NB_D ? nbs[nr.mb] : nullptr);
        };
        const HostMb* na = block_nb(kNb.a[z]);
        const HostMb* nb = block_nb(kNb.b[z]);
        const HostMb* nc = kNb.c[z].mb == NB_NA ? nullptr : block_nb(kNb.c[z]);
        const HostMb* nd = block_nb(kNb.d[z]);
        bool ba = pel_avail(na), bb = pel_avail(nb);
        bool bc = nc && pel_avail(nc), bd = pel_avail(nd);

        u32 mode;
        if (!(ba && bb)) {
          mode = 2;
        } else {
          u32 m1 = mb_is_i4(na->mb_type) ? na->intra4_modes[kNb.a[z].index] : 2;
          u32 m2 = mb_is_i4(nb->mb_type) ? nb->intra4_modes[kNb.b[z].index] : 2;
          mode = std::min(m1, m2);
        }
        if (!prev_flag[z]) {
          mode = rem_mode[z] < mode ? rem_mode[z] : rem_mode[z] + 1;
        }
        cur.intra4_modes[z] = u8(mode);
        i4_avail[z] = (ba ? kAvailA : 0) | (bb ? kAvailB : 0) |
                      (bc ? kAvailC : 0) | (bd ? kAvailD : 0);

        // mode feasibility (reference :771-825): failure corrupts the slice
        bool bad = false;
        switch (mode) {
          case 0: case 3: case 7: bad = !bb; break;
          case 1: case 8: bad = !ba; break;
          case 2: break;
          default: bad = !ba || !bb || !bd; break;  // modes 4,5,6
        }
        if (bad) return Status::kError;
      }
    } else {
      u32 m = i16_mode;
      if ((m == 0 && !av_b) || (m == 1 && !av_a) ||
          (m == 3 && !(av_a && av_b && av_d))) {
        return Status::kError;
      }
    }
    // chroma feasibility (reference :845-910)
    if ((chroma_mode == 1 && !av_a) || (chroma_mode == 2 && !av_b) ||
        (chroma_mode == 3 && !(av_a && av_b && av_d))) {
      return Status::kError;
    }
  } else {
    Status s = mv_prediction(addr, slice_id, mb_type, ref_idx, mvd, sub_types,
                             dpb, &cur);
    if (!ok(s)) { MBDBG("err: mv_pred mb=%u type=%u\n", addr, mb_type); return s; }
  }

  u32 mb_class = mb_type == kPSkip ? kMbSkip
                 : inter ? kMbInter
                 : mb_is_i4(mb_type) ? kMbIntra4 : kMbIntra16;
  emit_mb(addr, ctx, cur, mb_class, has_residual ? levels : nullptr,
          coeff_maps, mb_is_i4(mb_type) ? i4_avail : nullptr, avail,
          i16_mode, chroma_mode, out);
  return Status::kOk;
}

Status MbParser::decode_slice_data(BitReader& br, const SliceHeader& sh,
                                   const Sps& sps, const Pps& pps,
                                   const Dpb& dpb, const u32* slice_group_map,
                                   u32 slice_id, FrameTensors* out,
                                   u32* num_decoded_mbs, u32* last_mb_addr) {
  // reference h264bsdDecodeSliceData slice_data.c:86-232
  SliceContext ctx;
  ctx.sh = &sh;
  ctx.sps = &sps;
  ctx.pps = &pps;
  ctx.slice_id = slice_id;
  ctx.is_intra = is_i_slice(sh.slice_type);
  ctx.qp_y = i32(pps.pic_init_qp) + sh.slice_qp_delta;

  u32 curr = sh.first_mb_in_slice;
  u32 skip_run = 0;
  bool prev_skipped = false;
  u32 mb_count = 0;
  *num_decoded_mbs = 0;
  *last_mb_addr = 0;

  bool more;
  do {
    if (!sh.redundant_pic_cnt && mbs_[curr].decoded) {
      return Status::kError;  // primary slice, MB already decoded
    }
    // SetMbParams (slice_data.c:254-296): per-MB slice-constant state
    mbs_[curr].slice_id = slice_id;

    if (!ctx.is_intra && !prev_skipped) {
      if (!ok(br.ue(&skip_run))) { MBDBG("err: skiprun ue mb=%u\n", curr); return Status::kError; }
      if (skip_run > n_mbs_ - curr) { MBDBG("err: skiprun big %u mb=%u\n", skip_run, curr); return Status::kError; }
      if (skip_run) prev_skipped = true;
    }

    bool skipped = false;
    if (skip_run) {
      skip_run--;
      skipped = true;
    } else {
      prev_skipped = false;
    }
    Status s = parse_macroblock(br, ctx, curr, dpb, out, skipped);
    if (!ok(s)) { MBDBG("err: parse_macroblock mb=%u skipped=%d\n", curr, int(skipped)); return s; }

    if (mbs_[curr].decoded == 1) mb_count++;

    more = br.more_rbsp_data() || skip_run;
    // lastMbAddr only tracked for I slices (slice_data.c:203-205)
    if (ctx.is_intra) *last_mb_addr = curr;
    curr = next_mb_address(slice_group_map, n_mbs_, curr);
    if (more && !curr) { MBDBG("err: next addr 0, bits_left=%lld\n", (long long)br.bits_left()); return Status::kError; }
  } while (more);

  *num_decoded_mbs = mb_count;
  return Status::kOk;
}

void MbParser::mark_slice_corrupted(u32 first_mb_in_slice, u32 slice_id,
                                    u32 last_mb_addr,
                                    const u32* slice_group_map,
                                    FrameTensors* out) {
  // reference h264bsdMarkSliceCorrupted slice_data.c:298-354. last_mb_addr
  // is non-zero only for I slices (slice_data.c:203-205); then marking
  // starts MAX(picWidthInMbs, 10) same-slice MBs back from it.
  u32 curr = first_mb_in_slice;
  if (last_mb_addr) {
    u32 i = last_mb_addr - 1;
    u32 count = 0;
    while (i > curr) {
      if (mbs_[i].slice_id == slice_id) {
        count++;
        if (count >= std::max(width_mbs_, 10u)) break;
      }
      i--;
    }
    curr = i;
  }
  do {
    HostMb& m = mbs_[curr];
    if (m.slice_id == slice_id && m.decoded) {
      m.decoded--;
      out->decoded[curr] = m.decoded;
      if (m.decoded == 0) out->mb_class[curr] = kMbNone;
    } else {
      break;
    }
    curr = next_mb_address(slice_group_map, n_mbs_, curr);
  } while (curr);
}

}  // namespace h264tpu
