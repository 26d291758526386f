#!/usr/bin/env python3
"""Build an instrumented copy of the reference decoder under /tmp/ref_trace.

The instrumented binary decodes a stream and writes a binary trace of
per-macroblock state (parse-level + reconstructed-state) and pre-/post-deblock
frame dumps. Used only as a debugging oracle; lives outside the repo tree on
purpose (the repo never links or ships reference code).

Trace record format (little-endian):
  tag u32:
    1 = MB record        payload: mbNum u32, sliceId u32, mbType u32, qpY u32,
                         totalCoeff i16[27] (+1 pad), intra4x4PredMode u8[16],
                         refPic u32[4], mv i16[16][2],
                         layer: codedBlockPattern u32, mbQpDelta i32,
                         interModes: subMbType u32[4], refIdxL0 u32[4],
                         level i32[26][16]
    2 = pre-deblock frame   payload: byteCount u32, data
    3 = post-deblock frame  payload: byteCount u32, data
    4 = picture done        payload: picOrderCnt i32, frameNum u32,
                                     isIdr u32, nalRefIdc u32
"""

import shutil
import subprocess
import sys
from pathlib import Path

REF = Path("/root/reference")
OUT = Path("/tmp/ref_trace")

HOOK_HEADER = r"""
#ifndef TRACE_HOOKS_H
#define TRACE_HOOKS_H
#include "basetype.h"
#include "h264bsd_macroblock_layer.h"
#include "h264bsd_image.h"
void traceMb(u32 mbNum, macroblockLayer_t *lay, mbStorage_t *mb);
void traceFrame(u32 tag, image_t *img);
void tracePicDone(i32 poc, u32 frameNum, u32 isIdr, u32 nalRefIdc);
#endif
"""

HOOK_IMPL = r"""
#include <stdio.h>
#include <stdlib.h>
#include "trace_hooks.h"

static FILE* traceFile(void) {
    static FILE *f = NULL;
    if (!f) {
        const char *path = getenv("TRACE_OUT");
        f = fopen(path ? path : "/tmp/ref_trace.bin", "wb");
    }
    return f;
}

static void w32(u32 v) { fwrite(&v, 4, 1, traceFile()); }

void traceMb(u32 mbNum, macroblockLayer_t *lay, mbStorage_t *mb) {
    FILE *f = traceFile();
    w32(1); w32(mbNum); w32(mb->sliceId); w32((u32)mb->mbType); w32(mb->qpY);
    fwrite(mb->totalCoeff, sizeof(i16), 27, f);
    i16 pad = 0; fwrite(&pad, sizeof(i16), 1, f);
    fwrite(mb->intra4x4PredMode, 1, 16, f);
    fwrite(mb->refPic, 4, 4, f);
    fwrite(mb->mv, sizeof(mv_t), 16, f);
    w32(lay->codedBlockPattern);
    fwrite(&lay->mbQpDelta, 4, 1, f);
    fwrite(lay->subMbPred.subMbType, 4, 4, f);
    fwrite(lay->subMbPred.refIdxL0, 4, 4, f);
    fwrite(lay->residual.level, 4, 26*16, f);
}

void traceFrame(u32 tag, image_t *img) {
    FILE *f = traceFile();
    u32 n = img->width * img->height * 384;
    w32(tag); w32(n);
    fwrite(img->data, 1, n, f);
}

void tracePicDone(i32 poc, u32 frameNum, u32 isIdr, u32 nalRefIdc) {
    FILE *f = traceFile();
    w32(4); fwrite(&poc, 4, 1, f); w32(frameNum); w32(isIdr); w32(nalRefIdc);
    fflush(f);
}
"""


def patch(path: Path, old: str, new: str) -> None:
    text = path.read_text()
    assert text.count(old) == 1, f"pattern not unique/found in {path}: {old!r}"
    path.write_text(text.replace(old, new))


def main() -> None:
    if OUT.exists():
        shutil.rmtree(OUT)
    OUT.mkdir(parents=True)
    src = OUT / "src"
    shutil.copytree(REF / "src", src)
    shutil.copy(REF / "posix" / "test_h264bsd.c", OUT / "test_h264bsd.c")

    (src / "trace_hooks.h").write_text(HOOK_HEADER)
    (src / "trace_hooks.c").write_text(HOOK_IMPL)

    # hook: per-MB state after reconstruction of each macroblock
    sd = src / "h264bsd_slice_data.c"
    patch(sd, '#include "h264bsd_util.h"', '#include "h264bsd_util.h"\n#include "trace_hooks.h"')
    patch(
        sd,
        """        /* increment macroblock count only for macroblocks that were decoded
         * for the first time (redundant slices) */
        if (pStorage->mb[currMbAddr].decoded == 1)""",
        """        traceMb(currMbAddr, mbLayer, pStorage->mb + currMbAddr);

        /* increment macroblock count only for macroblocks that were decoded
         * for the first time (redundant slices) */
        if (pStorage->mb[currMbAddr].decoded == 1)""",
    )

    # hook: frames around deblocking + picture metadata
    dec = src / "h264bsd_decoder.c"
    patch(dec, '#include "h264bsd_byte_stream.h"',
          '#include "h264bsd_byte_stream.h"\n#include "trace_hooks.h"')
    patch(
        dec,
        "    if (picReady)\n    {\n        h264bsdFilterPicture(pStorage->currImage, pStorage->mb);",
        "    if (picReady)\n    {\n        traceFrame(2, pStorage->currImage);\n"
        "        h264bsdFilterPicture(pStorage->currImage, pStorage->mb);\n"
        "        traceFrame(3, pStorage->currImage);",
    )
    patch(
        dec,
        "        pStorage->picStarted = HANTRO_FALSE;\n"
        "        pStorage->validSliceInAccessUnit = HANTRO_FALSE;\n\n"
        "        return(H264BSD_PIC_RDY);",
        "        tracePicDone(picOrderCnt, pStorage->sliceHeader->frameNum,\n"
        "            IS_IDR_NAL_UNIT(pStorage->prevNalUnit) ? 1 : 0,\n"
        "            pStorage->prevNalUnit->nalRefIdc);\n"
        "        pStorage->picStarted = HANTRO_FALSE;\n"
        "        pStorage->validSliceInAccessUnit = HANTRO_FALSE;\n\n"
        "        return(H264BSD_PIC_RDY);",
    )

    lib_srcs = sorted(str(p) for p in src.glob("*.c"))
    subprocess.run(
        ["gcc", "-O2", "-std=gnu99", f"-I{src}", *lib_srcs,
         str(OUT / "test_h264bsd.c"), "-o", str(OUT / "trace_h264bsd")],
        check=True,
    )
    print(f"built {OUT}/trace_h264bsd")

    # resilient variant: same instrumented library under the keep-going
    # decode loop, so traces cover concealment of corrupt streams
    sys.path.insert(0, str(Path(__file__).parents[1]))
    from h264bsd_tpu.utils.golden import RESILIENT_MAIN
    (OUT / "resilient_main.c").write_text(RESILIENT_MAIN)
    subprocess.run(
        ["gcc", "-O2", "-std=gnu99", f"-I{src}", *lib_srcs,
         str(OUT / "resilient_main.c"),
         "-o", str(OUT / "trace_h264bsd_resilient")],
        check=True,
    )
    print(f"built {OUT}/trace_h264bsd_resilient")


if __name__ == "__main__":
    main()
