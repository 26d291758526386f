// Flat C ABI for the host front-end, consumed from Python via ctypes.
// The full decoder API lives in parser.h/api; the h264tpu_dev_* entry points
// exist only for unit/parity tests of internal pieces.

#include "bitreader.h"
#include "cavlc.h"
#include "common.h"
#include "nal.h"
#include "params.h"

using namespace h264tpu;

extern "C" {

// ---- dev/test surface ----

u32 h264tpu_dev_coeff_token(u32 bits16, i32 nc) {
  return dev_coeff_token(bits16, nc);
}
u32 h264tpu_dev_total_zeros(u32 bits9, u32 total_coeff, i32 chroma_dc) {
  return dev_total_zeros(bits9, total_coeff, chroma_dc != 0);
}
u32 h264tpu_dev_run_before(u32 bits11, u32 zeros_left) {
  return dev_run_before(bits11, zeros_left);
}

// Decode one residual block from raw RBSP bytes (test only).
// Returns packed (coeff_map << 16) | (total_coeff << 4) | status.
u32 h264tpu_dev_residual_block(const u8* data, u32 len, i32 nc,
                               u32 max_num_coeff, i16* coeff_level) {
  BitReader br(data, len);
  CavlcResult res;
  Status s = decode_residual_block(br, nc, max_num_coeff, coeff_level, &res);
  return (u32(res.coeff_map) << 16) | (res.total_coeff << 4) | u32(s);
}

// Parse an SPS NAL payload (header byte included); fills a small out array:
// [width_mbs, height_mbs, crop_l, crop_r, crop_t, crop_b, max_dpb, num_ref,
//  max_frame_num, poc_type, level, profile, cropping_flag]
u32 h264tpu_dev_parse_sps(const u8* data, u32 len, u32* out13) {
  NalExtractor ex;
  ExtractedNal nal;
  if (!ok(ex.extract(data, len, &nal))) return 1;
  BitReader br(nal.rbsp, nal.rbsp_size);
  NalUnit nu;
  if (!ok(NalExtractor::decode_nal_header(br, &nu))) return 1;
  if (nu.type != kNalSps) return 2;
  Sps sps;
  if (!ok(decode_sps(br, &sps))) return 3;
  u32 vals[13] = {sps.pic_width_in_mbs, sps.pic_height_in_mbs, sps.crop_left,
                  sps.crop_right,       sps.crop_top,          sps.crop_bottom,
                  sps.max_dpb_size,     sps.num_ref_frames,    sps.max_frame_num,
                  sps.poc_type,         sps.level_idc,         sps.profile_idc,
                  sps.frame_cropping ? 1u : 0u};
  std::memcpy(out13, vals, sizeof(vals));
  return 0;
}

}  // extern "C"
