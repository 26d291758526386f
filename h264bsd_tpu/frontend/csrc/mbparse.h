// Macroblock-layer parsing: slice-data loop, mb_type/pred/CBP/residual
// parse (CAVLC), nC context tracking, host-side motion-vector prediction and
// intra-mode inference. Emits dense per-frame tensors consumed by the
// JAX/Pallas reconstruction pipeline.
//
// Parity anchors: reference h264bsd_slice_data.c:86-354,
// h264bsd_macroblock_layer.c:134-1131, h264bsd_neighbour.c,
// h264bsd_inter_prediction.c:361-1028 (MV prediction half),
// h264bsd_intra_prediction.c:194-253 + :701-833 (mode inference half).
//
// Design note (TPU rebuild): the reference interleaves parse and pixel
// reconstruction per macroblock. Here the host resolves *all* serial,
// neighbour-dependent state — final MVs, DPB slots, final intra modes,
// availability flags, per-block nC/totalCoeff, qpY accumulation — and the
// pixel mathematics (dequant+IDCT, prediction, deblocking) runs later as
// whole-frame batched kernels on device. Coefficients are emitted raw (not
// dequantized) in raster 4x4 position order.
#pragma once

#include "bitreader.h"
#include "common.h"
#include "dpb.h"
#include "params.h"
#include "sliceheader.h"

namespace h264tpu {

// Device-facing per-MB classification.
enum MbClass : u8 {
  kMbNone = 0,   // not decoded (to be concealed)
  kMbSkip = 1,   // P_Skip
  kMbInter = 2,  // P_16x16 / 16x8 / 8x16 / 8x8(ref0)
  kMbIntra4 = 3,
  kMbIntra16 = 4,
  kMbIpcm = 5,
};

// Availability bits (pel availability after constrained-intra filtering).
enum AvailBit : u8 {
  kAvailA = 1,
  kAvailB = 2,
  kAvailC = 4,
  kAvailD = 8,
};

// Zigzag(decode) 4x4-block order -> raster order within MB
// (reference neighbour.c:51-62 block diagram; dcCoeffIndex
// macroblock_layer.c:79 is this same permutation).
constexpr u8 kZig2Ras[16] = {0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15};
// 4x4 coefficient zigzag scan position -> raster position
// (reference h264bsd_transform.c:120-155 rearrangement).
constexpr u8 kScan2Ras[16] = {0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15};

// Dense per-frame output; all arrays raster MB order, blocks raster within MB.
struct FrameTensors {
  u32 width_mbs = 0, height_mbs = 0, n_mbs = 0;

  std::vector<u8> mb_class;      // [nMB]
  std::vector<u8> qp_y;          // [nMB]
  std::vector<u32> slice_id;     // [nMB]
  std::vector<u8> decoded;       // [nMB] decode counter (redundant slices)
  std::vector<u8> disable_dblk;  // [nMB] disable_deblocking_filter_idc
  std::vector<i8> filter_off_a;  // [nMB] (stored *2)
  std::vector<i8> filter_off_b;  // [nMB]
  std::vector<i8> chroma_qp_offset;  // [nMB] active PPS chromaQpIndexOffset
  std::vector<u8> i16_mode;      // [nMB] 0..3
  std::vector<u8> chroma_mode;   // [nMB] 0..3
  std::vector<u8> i4_modes;      // [nMB*16] final modes, raster blocks
  std::vector<u8> i4_avail;      // [nMB*16] AvailBits per block
  std::vector<u8> mb_avail;      // [nMB] AvailBits (A,B,D used) for i16/chroma
  std::vector<i16> mv;           // [nMB*16*2] quarter-pel, raster blocks
  std::vector<i8> ref_slot;      // [nMB*16] DPB slot per block, -1 invalid
  std::vector<u8> nnz;           // [nMB*24] totalCoeff: luma16+cb4+cr4 raster
  std::vector<u8> nnz_dc;        // [nMB*3] totalCoeff of blocks 24/25/26
  std::vector<u32> ipcm_mb;      // MB indices with raw PCM samples
  std::vector<u8> ipcm_data;     // 384 bytes per ipcm_mb entry

  // sparse residual stream: one entry per non-empty block. id = mb*26 + b
  // with b 0..23 = coefficient blocks (raster), 24 = luma DC (16 values),
  // 25 = chroma DC (8 values, padded to 16). Levels raster-ordered.
  std::vector<u32> sparse_id;
  std::vector<i16> sparse_level;  // 16 per entry

  // single-buffer packed per-MB metadata for one-shot host->device
  // transfer; 12 bytes per MB, see build_packed()
  std::vector<u8> packed;
  // dense per-MB slice-table indices; sent only for multi-slice pictures
  // (single-slice pictures reconstruct index 0 on device)
  std::vector<u16> slice_ids;
  // per-slice parameter table: one i8[4] row per slice id used this
  // picture: [filter_off_a, filter_off_b, chroma_qp_offset, 0]
  std::vector<i8> slice_table;
  // sparse per-block MV/ref exceptions (MBs whose partitions differ):
  // id u32 + 16 packed u32 blocks (x 13 bits | y 13 bits << 13 |
  // (ref+1) 6 bits << 26; MV ranges are [-2048, 2047] / [-512, 511]
  // quarter-pel, inter_prediction.c:537-544)
  // quad-grained motion exceptions: id = mb*4 + quadrant, payload 16 B
  // per entry (4 packed u32 blocks, x13 | y13<<13 | (ref+1)<<26, in
  // kQuadBlocks order)
  std::vector<u32> mv_exc_id;
  std::vector<u8> mv_exc_payload;
  // sparse intra payloads aligned with intra_mbs: 16 nibble-packed bytes
  // per MB, byte j = i4_modes[j] | (i4_avail[j] << 4)
  std::vector<u8> intra_payload;
  void build_packed();
  // transfer classification of the sparse residual stream (most blocks
  // carry ONE coefficient; ~92% fit the first 8 raster positions):
  //   single: u32 record (id << 12 | pos << 8 | (value & 0xFF)), 4 B
  //   short:  id + first 8 levels as i8, 12 B
  //   full:   id + 16 levels as i8 (+ wide escapes), 20 B
  std::vector<u32> cls_single;           // packed records
  std::vector<u32> cls_short, cls_full;  // indices into sparse_id
  u32 cls_wide = 0;                      // escapes among full blocks
  void classify_sparse();
  // single transfer blob: one host->device copy per frame instead of
  // eight. Sections written back-to-back at their REAL counts behind a
  // 64-byte count header, whole buffer zero-padded to total_bytes (a
  // coarse host-side tier). The device derives section offsets from the
  // header and masks entries beyond the real counts — transfer volume
  // tracks content instead of the caps (the tunnel link moves
  // ~15-35 MB/s, so cap padding directly costs fps). The caps still
  // clamp counts (device slice sizes stay cap-static).
  std::vector<u8> blob;
  void build_blob_compact(u32 single_cap, u32 short_cap, u32 full_cap,
                          u32 wide_cap, u32 exc_cap, u32 intra_cap,
                          u32 stab_cap, u32 sid_cap, u32 total_bytes);
  // intra MB list (classes 3/4) in raster order, for the device fast path
  std::vector<u32> intra_mbs;

  // per-picture quarter-pel MV extremes over every stored block MV; the
  // device picks a static shift-range tier for the motion-compensation
  // pass from these (fallback to the unbounded gather path when huge)
  i32 mv_min[2] = {0, 0};
  i32 mv_max[2] = {0, 0};
  // bitmask of DPB slots referenced by any block this picture: the MC
  // kernel holds the referenced planes in VMEM and tiers on their count
  u32 used_slot_mask = 0;

  void reset(u32 w_mbs, u32 h_mbs);
  void clear_picture();  // new picture: zero decoded state
};

// Host-persistent per-MB parse state (the parse-relevant half of the
// reference mbStorage_t, h264bsd_macroblock_layer.h:162-185).
struct HostMb {
  u32 slice_id = 0;
  u8 decoded = 0;
  u8 mb_type = 0;              // internal numbering, P_Skip=0..I_PCM=31
  i16 total_coeff[27] = {};    // zigzag block order
  u8 intra4_modes[16] = {};    // zigzag block order, resolved modes
  i16 mv[16][2] = {};          // zigzag block order
  u8 ref_pic[4] = {};          // refIdxL0 per 8x8 part
  i8 ref_slot[4] = {-1, -1, -1, -1};
  u8 qp_y = 0;
};

// Per-slice parse context.
struct SliceContext {
  const SliceHeader* sh = nullptr;
  const Sps* sps = nullptr;
  const Pps* pps = nullptr;
  u32 slice_id = 0;
  bool is_intra = false;
  i32 qp_y = 0;  // running slice QP
};

class MbParser {
 public:
  void configure(u32 width_mbs, u32 height_mbs);

  // Decode all macroblocks of one slice into tensors/state
  // (reference h264bsdDecodeSliceData slice_data.c:86-232). slice_id must be
  // the incremented per-picture slice counter. Returns kError on invalid
  // stream data (caller then runs mark_slice_corrupted).
  Status decode_slice_data(BitReader& br, const SliceHeader& sh,
                           const Sps& sps, const Pps& pps, const Dpb& dpb,
                           const u32* slice_group_map, u32 slice_id,
                           FrameTensors* out, u32* num_decoded_mbs,
                           u32* last_mb_addr);

  // reference h264bsdMarkSliceCorrupted slice_data.c:298-354.
  void mark_slice_corrupted(u32 first_mb_in_slice, u32 slice_id,
                            u32 last_mb_addr, const u32* slice_group_map,
                            FrameTensors* out);

  // reference h264bsdResetStorage storage.c:441 per-MB part.
  void reset_picture(FrameTensors* out);

  u32 pic_size_in_mbs() const { return n_mbs_; }
  const HostMb& mb(u32 i) const { return mbs_[i]; }

 private:
  struct Neigh {  // resolved neighbour reference: MB pointer + block index
    const HostMb* mb = nullptr;  // nullptr = outside picture
    u8 index = 0;
  };

  const HostMb* nbr_mb(u32 addr, int which) const;  // A=0,B=1,C=2,D=3
  bool nbr_available(const HostMb* n, u32 slice_id) const;
  i32 determine_nc(u32 addr, u32 slice_id, u32 zig_block,
                   const i16* cur_total_coeff) const;

  Status parse_macroblock(BitReader& br, SliceContext& ctx, u32 addr,
                          const Dpb& dpb, FrameTensors* out, bool skipped);
  Status parse_residual(BitReader& br, u32 addr, u32 slice_id, u32 mb_type,
                        u32 cbp, i16 levels[27][16], u16 coeff_maps[24],
                        i16 total_coeff[27], u32 abs_sums[27]);
  Status mv_prediction(u32 addr, u32 slice_id, u32 mb_type,
                       const u32 ref_idx[4], const i16 mvd[16][2],
                       const u8 sub_types[4], const Dpb& dpb, HostMb* cur);
  Status residual_range_check(const i16 levels[27][16],
                              const i16 total_coeff[27],
                              const u32 abs_sums[27], u32 mb_type,
                              u32 qp_y, i32 chroma_qp_index_offset) const;
  void emit_mb(u32 addr, const SliceContext& ctx, const HostMb& cur,
               u32 mb_class, const i16 levels[27][16],
               const u16 coeff_maps[24], const u8 i4_avail[16],
               u8 mb_avail, u8 i16_mode, u8 chroma_mode,
               FrameTensors* out) const;

  u32 width_mbs_ = 0, height_mbs_ = 0, n_mbs_ = 0;
  std::vector<HostMb> mbs_;
};

}  // namespace h264tpu
