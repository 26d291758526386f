"""Streaming decoder session — the TPU-native analogue of the reference's
JS/wasm wrapper classes (reference wasm/h264bsd_decoder.js H264bsdDecoder
queueInput/decode/nextOutputPicture* and wasm/h264bsd_worker.js's
'pictureReady'/'pictureParams'/'noInput'/'decoderReady' event protocol).

Feed arbitrary byte chunks with queue_input(); pictures and header events
are delivered through callbacks. Unlike the wasm wrapper there is no
emscripten-heap copy boundary — pictures hand out device arrays directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from .decoder import Decoder, OutputPicture, PIC_RDY, HDRS_RDY, ERROR

NO_INPUT = 1024  # reference wasm/h264bsd_decoder.js:68


@dataclass
class StreamingDecoder:
    """Push-based session: queue_input() then pump()."""

    on_picture_ready: Optional[Callable[[OutputPicture], None]] = None
    on_headers_ready: Optional[Callable[[dict], None]] = None
    on_error: Optional[Callable[[int, int], None]] = None
    _dec: Decoder = field(default_factory=Decoder)
    _buf: bytearray = field(default_factory=bytearray)
    _pos: int = 0
    _n_pics: int = 0

    def queue_input(self, data: bytes) -> None:
        # drop consumed prefix lazily to keep the buffer bounded
        if self._pos > 1 << 20:
            del self._buf[:self._pos]
            self._pos = 0
        self._buf.extend(data)

    def decode(self) -> int:
        """Decode one NAL unit (reference decode() one-NAL-per-call
        contract). Returns the decoder status or NO_INPUT."""
        if self._pos >= len(self._buf):
            return NO_INPUT
        status, read = self._dec.decode(bytes(self._buf[self._pos:]),
                                        pic_id=self._n_pics)
        self._pos += read
        if status == HDRS_RDY and self.on_headers_ready:
            self.on_headers_ready(self.picture_params())
        elif status == PIC_RDY:
            while (pic := self._dec.next_output_picture()) is not None:
                self._n_pics += 1
                if self.on_picture_ready:
                    self.on_picture_ready(pic)
        elif status >= ERROR:
            if self.on_error:
                self.on_error(status, self._pos)
            if read == 0:
                return NO_INPUT  # cannot make progress without new input
        return status

    def pump(self) -> int:
        """Decode until input is exhausted (worker 'queueInput' handler
        loop, reference h264bsd_worker.js:26-53). Returns pictures emitted."""
        before = self._n_pics
        while self.decode() != NO_INPUT:
            pass
        return self._n_pics - before

    def picture_params(self) -> dict:
        crop = self._dec.cropping_params()
        sar = self._dec.sample_aspect_ratio()
        return {
            "width": self._dec.pic_width(),
            "height": self._dec.pic_height(),
            "croppingParams": {
                "width": crop[2], "height": crop[4],
                "left": crop[1], "top": crop[3],
            } if crop[0] else None,
            "sar": sar,
            "profile": self._dec.profile(),
            "fullRange": self._dec.video_full_range(),
        }
