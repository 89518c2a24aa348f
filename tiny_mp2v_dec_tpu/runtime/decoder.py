"""Production decoder: host parse/tokenize -> device reconstruction.

The TPU-native counterpart of the reference's ``mp2v_decoder_c``
(reference: src/core/decoder.h:82-131, decoder.cpp:278-329): the host walks
start codes, maintains sequence/picture state and the two-slot reference
list, tokenizes each picture's slices into dense tensors (native C++
tokenizer when built, Python fallback), and dispatches one compiled XLA
reconstruction per picture.  Reference planes live on device between
pictures; display reordering matches decoder.cpp:346-379.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import headers as H
from ..golden.decoder import DecodedFrame, scan_start_codes
from ..ops.recon import DeviceRecon
from ..tokenizer import get_tokenizer
from ..tokenizer.types import CHROMA_INFO, PictureGeometry, PictureParams, PictureTokens


@dataclass
class DecoderConfig:
    """Mirrors the reference's decoder_config_t (decoder.h:25-32)."""
    width: int = 0                # 0 = take from the sequence header
    height: int = 0
    chroma_format: int = 0
    pictures_pool_size: int = 10
    num_threads: int = 0          # 0 = auto (native tokenizer threads)
    reordering: bool = True


class MP2VDecoder:
    """Decode MPEG-2 elementary streams to YUV frames on TPU.

    Frames are delivered to ``renderer`` (if given) and returned from
    ``decode`` in display order (or decode order with reordering off).
    """

    def __init__(self, config: DecoderConfig = DecoderConfig(),
                 renderer: Optional[Callable[[DecodedFrame], None]] = None):
        self.config = config
        self.renderer = renderer
        self.tokenize_picture = get_tokenizer(config.num_threads)
        self._recons = {}
        self.reset()

    def reset(self) -> None:
        self.seq: Optional[H.SequenceHeader] = None
        self.sext = H.SequenceExtension()
        self.sscal = None
        self.gop = None
        self._refs = [None, None]      # device plane tuples, decode order
        self._reorder_slot = None
        self._frames: List[DecodedFrame] = []
        self.stats = {"pictures": 0, "tokenize_s": 0.0, "device_s": 0.0,
                      "output_s": 0.0}

    # ------------------------------------------------------------------
    def _recon_for(self, geom: PictureGeometry, field_support: bool) -> DeviceRecon:
        key = (geom, field_support)
        if key not in self._recons:
            self._recons[key] = DeviceRecon(geom, field_support=field_support)
        return self._recons[key]

    def _emit(self, frame: DecodedFrame) -> None:
        if self.renderer is not None:
            self.renderer(frame)
        self._frames.append(frame)

    def _crop_to_host(self, planes, geom: PictureGeometry,
                      ph: H.PictureHeader) -> DecodedFrame:
        xs, ys, _ = CHROMA_INFO[geom.chroma_format]
        cw = (geom.width + (1 << xs) - 1) >> xs
        ch = (geom.height + (1 << ys) - 1) >> ys
        t0 = time.perf_counter()
        y = np.asarray(planes[0][:geom.height, :geom.width])
        u = np.asarray(planes[1][:ch, :cw])
        v = np.asarray(planes[2][:ch, :cw])
        self.stats["output_s"] += time.perf_counter() - t0
        return DecodedFrame(y=y, u=u, v=v,
                            temporal_reference=ph.temporal_reference,
                            picture_coding_type=ph.picture_coding_type)

    # ------------------------------------------------------------------
    def decode(self, data: bytes) -> List[DecodedFrame]:
        self._frames = []
        cur = None
        ended = False
        for off in scan_start_codes(data):
            off = int(off)
            code = data[off + 3]
            r_pos = (off + 4) * 8
            if code == H.SEQUENCE_HEADER_CODE:
                self.seq = H.SequenceHeader.parse(H.BitReader(data, r_pos))
            elif code == H.EXTENSION_START_CODE:
                r = H.BitReader(data, r_pos)
                ext_id = r.read(4)
                if ext_id == H.SEQUENCE_EXTENSION_ID:
                    self.sext = H.SequenceExtension.parse(r)
                elif ext_id == H.SEQUENCE_SCALABLE_EXTENSION_ID:
                    self.sscal = H.SequenceScalableExtension.parse(r)
                elif ext_id == H.PICTURE_CODING_EXTENSION_ID and cur is not None:
                    cur["pcext"] = H.PictureCodingExtension.parse(r)
                elif ext_id == H.QUANT_MATRIX_EXTENSION_ID and cur is not None:
                    cur["qmext"] = H.QuantMatrixExtension.parse(r)
            elif code == H.GROUP_START_CODE:
                self.gop = H.GroupOfPicturesHeader.parse(H.BitReader(data, r_pos))
            elif code == H.PICTURE_START_CODE:
                if cur is not None:
                    self._decode_picture(data, cur)
                ph = H.PictureHeader.parse(H.BitReader(data, r_pos))
                cur = {"header": ph,
                       "pcext": H.PictureCodingExtension(
                           f_code=((ph.forward_f_code,) * 2,
                                   (ph.backward_f_code,) * 2)),
                       "qmext": None, "slices": []}
            elif code in (H.SEQUENCE_END_CODE, H.SEQUENCE_ERROR_CODE):
                if cur is not None:
                    self._decode_picture(data, cur)
                    cur = None
                ended = True
                break
            elif H.SLICE_START_CODE_MIN <= code <= H.SLICE_START_CODE_MAX:
                if cur is not None:
                    cur["slices"].append((r_pos, code))
        if cur is not None:
            self._decode_picture(data, cur)
        self.flush()
        return self._frames

    def flush(self) -> None:
        if self._reorder_slot is not None:
            self._emit(self._reorder_slot)
            self._reorder_slot = None

    # ------------------------------------------------------------------
    def _decode_picture(self, data: bytes, cur) -> None:
        assert self.seq is not None, "picture before sequence header"
        ph: H.PictureHeader = cur["header"]
        pcext: H.PictureCodingExtension = cur["pcext"]
        geom = PictureGeometry(
            width=self.config.width or (self.seq.horizontal_size_value
                                        | (self.sext.horizontal_size_extension << 12)),
            height=self.config.height or (self.seq.vertical_size_value
                                          | (self.sext.vertical_size_extension << 12)),
            chroma_format=self.config.chroma_format or self.sext.chroma_format,
        )
        params = PictureParams(
            picture_coding_type=ph.picture_coding_type,
            f_code=pcext.f_code,
            intra_dc_precision=pcext.intra_dc_precision,
            picture_structure=pcext.picture_structure,
            frame_pred_frame_dct=pcext.frame_pred_frame_dct,
            concealment_motion_vectors=pcext.concealment_motion_vectors,
            q_scale_type=pcext.q_scale_type,
            intra_vlc_format=pcext.intra_vlc_format,
            alternate_scan=pcext.alternate_scan,
            chroma_format=geom.chroma_format,
            vertical_size=geom.height,
            quant_matrices=H.build_quant_matrices(self.seq, cur["qmext"]),
        )
        t0 = time.perf_counter()
        tokens = self.tokenize_picture(data, cur["slices"], params, geom)
        t1 = time.perf_counter()

        field_support = bool(tokens.field_pred.any())
        recon = self._recon_for(geom, field_support)
        if ph.picture_coding_type in (H.PCT_I, H.PCT_P):
            ref0, ref1 = self._refs[1], None
        else:
            ref0, ref1 = self._refs[0], self._refs[1]
        planes = recon(tokens, ref0, ref1)
        t2 = time.perf_counter()
        self.stats["pictures"] += 1
        self.stats["tokenize_s"] += t1 - t0
        self.stats["device_s"] += t2 - t1

        frame = self._crop_to_host(planes, geom, ph)
        if ph.picture_coding_type in (H.PCT_I, H.PCT_P):
            self._refs = [self._refs[1], planes]
            if self.config.reordering:
                if self._reorder_slot is not None:
                    self._emit(self._reorder_slot)
                self._reorder_slot = frame
            else:
                self._emit(frame)
        else:
            self._emit(frame)
