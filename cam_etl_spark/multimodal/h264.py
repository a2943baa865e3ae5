"""H.264/AVC (ISO/IEC 14496-10) STRUCTURAL parsing — Annex-B byte
streams, NAL units, exp-Golomb, SPS / PPS / slice headers.

Codes-recovered (not pixels) coverage:

* Annex-B framing (B.1): 3- and 4-byte start codes, NAL unit split,
  trailing-zero tolerance;
* NAL unit header (7.3.1): forbidden_zero_bit / nal_ref_idc /
  nal_unit_type, plus EBSP->RBSP extraction with
  emulation_prevention_three_byte removal and the 7.4.1 legality
  check (0x000000 / 0x000001 / 0x000002 must not appear in EBSP);
* exp-Golomb ue(v) / se(v) (9.1) read AND write (the writer is
  fixture synthesis, same discipline as mpegaudio.py / mp3.py);
* the COMPLETE sequence parameter set (7.3.2.1.1): profile/
  constraint-set flags/level, the high-profile extension block
  (chroma_format_idc incl. separate_colour_plane_flag, bit depths,
  qpprime_y_zero_transform_bypass_flag, seq_scaling_matrix with the
  7.3.2.1.1.1 delta_scale recurrence and use-default marking), both
  pic_order_cnt_type 0 and 1 field sets, frame/MBAFF flags, frame
  cropping with the 7.4.2.1.1 CropUnitX/Y chroma-dependent units,
  and VUI (E.1.1) with aspect ratio (incl. Extended_SAR), overscan,
  video signal type + colour description, chroma loc, timing info,
  NAL and VCL HRD (E.1.2), low_delay_hrd_flag, pic_struct, and the
  bitstream-restriction block;
* the picture parameter set (7.3.2.2) for the 1-slice-group case,
  including the more_rbsp_data() tail (transform_8x8_mode_flag,
  pic_scaling_matrix_present_flag, second_chroma_qp_index_offset);
* slice headers (7.3.3) for I/IDR slices and simple P slices:
  first_mb_in_slice, slice_type, PPS id, colour_plane_id,
  frame_num at its SPS-derived width, field/bottom flags,
  idr_pic_id, both POC field layouts, redundant_pic_cnt,
  num_ref_idx override, dec_ref_pic_marking (IDR flags and the
  sliding-window case), cabac_init_idc, slice_qp_delta and the
  deblocking-filter controls — the parse stops AT slice data and
  reports the header bit length.

NOT covered — loud documented boundaries (docs/SCALE.md), every one
rejected with NotImplementedError/ValueError, never mis-parsed:

* slice DATA: the macroblock layer, CAVLC residual tables and CABAC
  arithmetic decode to pixels (the spec's 9.2/9.3 + clause 8
  reconstruction);
* FMO / multiple slice groups (num_slice_groups_minus1 > 0),
  ref_pic_list_modification commands, adaptive memory management
  (MMCO), prediction-weight tables, SP/SI slices, data partitioning
  (NAL types 2-4), and SVC/MVC extension NALs (14/15/20).

Reference parity: the reference repo (cam-etl) contains no video
decoding at all; this extends the engine's multimodal surface
(SURVEY.md §2.8) beyond reference scope, shrinking the H.264 honest
stub in multimodal/codecs.py to slice-data decode only.
"""

from __future__ import annotations

from cam_etl_spark.multimodal.mpegaudio import _BitReader, _BitWriter

# NAL unit types (Table 7-1) this module understands.
NAL_SLICE = 1
NAL_IDR = 5
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8
NAL_AUD = 9

#: profile_idc values whose SPS carries the high-profile extension
#: block (7.3.2.1.1 "if( profile_idc == 100 || ... )").
HIGH_PROFILES = frozenset(
    {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}
)

#: SubWidthC / SubHeightC per chroma_format_idc (Table 6-1);
#: chroma_format_idc 0 (monochrome) has no chroma arrays.
_SUB_WH = {1: (2, 2), 2: (2, 1), 3: (1, 1)}


# ---------------------------------------------------------------------------
# exp-Golomb (9.1)
# ---------------------------------------------------------------------------


def ue_read(r: _BitReader) -> int:
    """ue(v): leadingZeroBits zeros, a 1, then leadingZeroBits info bits."""
    lz = 0
    while r.read(1) == 0:
        lz += 1
        if lz > 32:
            raise ValueError("h264: exp-Golomb run-away (corrupt stream)")
    return (1 << lz) - 1 + (r.read(lz) if lz else 0)


def se_read(r: _BitReader) -> int:
    """se(v): codeNum k -> (-1)^(k+1) * ceil(k/2) (9.1.1)."""
    k = ue_read(r)
    return (k + 1) // 2 if k % 2 else -(k // 2)


def ue_write(w: _BitWriter, v: int) -> None:
    if v < 0:
        raise ValueError("ue(v) is unsigned")
    n = (v + 1).bit_length()
    w.write(0, n - 1)
    w.write(v + 1, n)


def se_write(w: _BitWriter, v: int) -> None:
    ue_write(w, 2 * v - 1 if v > 0 else -2 * v)


def ue_bits(v: int) -> int:
    """Bit cost of ue(v) — 2*floor(log2(v+1)) + 1."""
    return 2 * (v + 1).bit_length() - 1


# ---------------------------------------------------------------------------
# RBSP <-> EBSP (7.3.1 / 7.4.1) and Annex-B framing (B.1)
# ---------------------------------------------------------------------------


def rbsp_to_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation_prevention_three_byte: any 0x00 0x00 followed by
    a byte <= 0x03 gets a 0x03 interposed."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def ebsp_to_rbsp(ebsp: bytes) -> bytes:
    """Strip emulation prevention; reject the 7.4.1-illegal sequences
    0x000000 / 0x000001 / 0x000002 inside a NAL unit."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2:
            if b <= 2:
                raise ValueError(
                    f"h264: illegal byte sequence 00 00 {b:02x} inside NAL"
                )
            if b == 3:
                zeros = 0
                i += 1
                continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def rbsp_trailing_write(w: _BitWriter) -> None:
    w.write(1, 1)
    w.align()


def rbsp_trailing_check(r: _BitReader, rbsp_len: int) -> int:
    """Verify rbsp_stop_one_bit + zero alignment; return payload bits."""
    used = r.pos * 8 - r._n
    # walk back from the end: last byte must be 1000... after the stop bit
    last = rbsp_len * 8
    if r.read(1) != 1:
        raise ValueError("h264: missing rbsp_stop_one_bit")
    while (r.pos * 8 - r._n) < last:
        if r.read(1) != 0:
            raise ValueError("h264: nonzero rbsp_alignment bit")
    return used


def split_annexb(stream: bytes) -> list[bytes]:
    """Split an Annex-B byte stream into EBSP NAL units (start codes
    00 00 01 or 00 00 00 01; leading/trailing zero bytes tolerated)."""
    nals: list[bytes] = []
    i = 0
    n = len(stream)
    start = -1
    while i + 2 < n:
        if stream[i] == 0 and stream[i + 1] == 0 and stream[i + 2] == 1:
            if start >= 0:
                end = i
                while end > start and stream[end - 1] == 0:
                    end -= 1
                nals.append(stream[start:end])
            start = i + 3
            i += 3
        else:
            i += 1
    if start < 0:
        raise ValueError("h264: no start code in Annex-B stream")
    end = n
    while end > start and stream[end - 1] == 0:
        end -= 1
    nals.append(stream[start:end])
    return [x for x in nals if x]


def nal_header(ebsp: bytes) -> tuple[int, int]:
    """Return (nal_ref_idc, nal_unit_type); reject forbidden_zero_bit=1
    and the extension NAL types this module does not parse."""
    if not ebsp:
        raise ValueError("h264: empty NAL unit")
    b = ebsp[0]
    if b & 0x80:
        raise ValueError("h264: forbidden_zero_bit set")
    ref_idc, ntype = (b >> 5) & 3, b & 0x1F
    if ntype in (2, 3, 4):
        raise NotImplementedError("h264: data partitioning (NAL 2-4)")
    if ntype in (14, 15, 20):
        raise NotImplementedError("h264: SVC/MVC extension NAL")
    return ref_idc, ntype


def make_nal(ref_idc: int, ntype: int, rbsp: bytes) -> bytes:
    return bytes([(ref_idc & 3) << 5 | (ntype & 0x1F)]) + rbsp_to_ebsp(rbsp)


def annexb_stream(nals: list[bytes], long_first: bool = True) -> bytes:
    out = bytearray()
    for i, nal in enumerate(nals):
        out += b"\x00\x00\x00\x01" if (i == 0 and long_first) else b"\x00\x00\x01"
        out += nal
    return bytes(out)


# ---------------------------------------------------------------------------
# Scaling lists (7.3.2.1.1.1)
# ---------------------------------------------------------------------------


def _scaling_list_read(r: _BitReader, size: int) -> tuple[list[int], bool]:
    last, nxt = 8, 8
    use_default = False
    out = []
    for j in range(size):
        if nxt != 0:
            delta = se_read(r)
            nxt = (last + delta + 256) % 256
            use_default = j == 0 and nxt == 0
        out.append(last if nxt == 0 else nxt)
        last = out[-1]
    return out, use_default


def _scaling_list_write(w: _BitWriter, values: list[int]) -> None:
    last = 8
    for v in values:
        delta = (v - last) % 256
        if delta > 127:
            delta -= 256
        se_write(w, delta)
        last = v


# ---------------------------------------------------------------------------
# HRD parameters (E.1.2)
# ---------------------------------------------------------------------------


def _hrd_read(r: _BitReader) -> dict:
    cpb_cnt = ue_read(r) + 1
    h = {
        "cpb_cnt": cpb_cnt,
        "bit_rate_scale": r.read(4),
        "cpb_size_scale": r.read(4),
        "cpb": [
            (ue_read(r), ue_read(r), r.read(1)) for _ in range(cpb_cnt)
        ],
        "initial_cpb_removal_delay_length": r.read(5) + 1,
        "cpb_removal_delay_length": r.read(5) + 1,
        "dpb_output_delay_length": r.read(5) + 1,
        "time_offset_length": r.read(5),
    }
    return h


def _hrd_write(w: _BitWriter, h: dict) -> None:
    ue_write(w, h["cpb_cnt"] - 1)
    w.write(h["bit_rate_scale"], 4)
    w.write(h["cpb_size_scale"], 4)
    for br, cs, cbr in h["cpb"]:
        ue_write(w, br)
        ue_write(w, cs)
        w.write(cbr, 1)
    w.write(h["initial_cpb_removal_delay_length"] - 1, 5)
    w.write(h["cpb_removal_delay_length"] - 1, 5)
    w.write(h["dpb_output_delay_length"] - 1, 5)
    w.write(h["time_offset_length"], 5)


# ---------------------------------------------------------------------------
# VUI (E.1.1)
# ---------------------------------------------------------------------------


def _vui_read(r: _BitReader) -> dict:
    v: dict = {}
    if r.read(1):
        idc = r.read(8)
        v["aspect_ratio_idc"] = idc
        if idc == 255:  # Extended_SAR
            v["sar"] = (r.read(16), r.read(16))
    if r.read(1):
        v["overscan_appropriate_flag"] = r.read(1)
    if r.read(1):
        v["video_format"] = r.read(3)
        v["video_full_range_flag"] = r.read(1)
        if r.read(1):
            v["colour"] = (r.read(8), r.read(8), r.read(8))
    if r.read(1):
        v["chroma_sample_loc"] = (ue_read(r), ue_read(r))
    if r.read(1):
        v["num_units_in_tick"] = r.read(32)
        v["time_scale"] = r.read(32)
        v["fixed_frame_rate_flag"] = r.read(1)
    nal_hrd = r.read(1)
    if nal_hrd:
        v["nal_hrd"] = _hrd_read(r)
    vcl_hrd = r.read(1)
    if vcl_hrd:
        v["vcl_hrd"] = _hrd_read(r)
    if nal_hrd or vcl_hrd:
        v["low_delay_hrd_flag"] = r.read(1)
    v["pic_struct_present_flag"] = r.read(1)
    if r.read(1):
        v["bitstream_restriction"] = {
            "motion_vectors_over_pic_boundaries_flag": r.read(1),
            "max_bytes_per_pic_denom": ue_read(r),
            "max_bits_per_mb_denom": ue_read(r),
            "log2_max_mv_length_horizontal": ue_read(r),
            "log2_max_mv_length_vertical": ue_read(r),
            "max_num_reorder_frames": ue_read(r),
            "max_dec_frame_buffering": ue_read(r),
        }
    return v


def _vui_write(w: _BitWriter, v: dict) -> None:
    has_ar = "aspect_ratio_idc" in v
    w.write(int(has_ar), 1)
    if has_ar:
        w.write(v["aspect_ratio_idc"], 8)
        if v["aspect_ratio_idc"] == 255:
            w.write(v["sar"][0], 16)
            w.write(v["sar"][1], 16)
    has_ov = "overscan_appropriate_flag" in v
    w.write(int(has_ov), 1)
    if has_ov:
        w.write(v["overscan_appropriate_flag"], 1)
    has_vst = "video_format" in v
    w.write(int(has_vst), 1)
    if has_vst:
        w.write(v["video_format"], 3)
        w.write(v["video_full_range_flag"], 1)
        has_col = "colour" in v
        w.write(int(has_col), 1)
        if has_col:
            for x in v["colour"]:
                w.write(x, 8)
    has_cl = "chroma_sample_loc" in v
    w.write(int(has_cl), 1)
    if has_cl:
        ue_write(w, v["chroma_sample_loc"][0])
        ue_write(w, v["chroma_sample_loc"][1])
    has_t = "num_units_in_tick" in v
    w.write(int(has_t), 1)
    if has_t:
        w.write(v["num_units_in_tick"], 32)
        w.write(v["time_scale"], 32)
        w.write(v["fixed_frame_rate_flag"], 1)
    w.write(int("nal_hrd" in v), 1)
    if "nal_hrd" in v:
        _hrd_write(w, v["nal_hrd"])
    w.write(int("vcl_hrd" in v), 1)
    if "vcl_hrd" in v:
        _hrd_write(w, v["vcl_hrd"])
    if "nal_hrd" in v or "vcl_hrd" in v:
        w.write(v["low_delay_hrd_flag"], 1)
    w.write(v["pic_struct_present_flag"], 1)
    br = v.get("bitstream_restriction")
    w.write(int(br is not None), 1)
    if br is not None:
        w.write(br["motion_vectors_over_pic_boundaries_flag"], 1)
        ue_write(w, br["max_bytes_per_pic_denom"])
        ue_write(w, br["max_bits_per_mb_denom"])
        ue_write(w, br["log2_max_mv_length_horizontal"])
        ue_write(w, br["log2_max_mv_length_vertical"])
        ue_write(w, br["max_num_reorder_frames"])
        ue_write(w, br["max_dec_frame_buffering"])


# ---------------------------------------------------------------------------
# SPS (7.3.2.1.1)
# ---------------------------------------------------------------------------


def parse_sps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    s: dict = {
        "profile_idc": r.read(8),
        "constraint_set_flags": r.read(6),
    }
    if r.read(2) != 0:
        raise ValueError("h264: reserved_zero_2bits nonzero in SPS")
    s["level_idc"] = r.read(8)
    s["seq_parameter_set_id"] = ue_read(r)
    s["chroma_format_idc"] = 1
    s["separate_colour_plane_flag"] = 0
    s["bit_depth_luma_minus8"] = 0
    s["bit_depth_chroma_minus8"] = 0
    if s["profile_idc"] in HIGH_PROFILES:
        s["chroma_format_idc"] = ue_read(r)
        if s["chroma_format_idc"] > 3:
            raise ValueError("h264: chroma_format_idc > 3")
        if s["chroma_format_idc"] == 3:
            s["separate_colour_plane_flag"] = r.read(1)
        s["bit_depth_luma_minus8"] = ue_read(r)
        s["bit_depth_chroma_minus8"] = ue_read(r)
        s["qpprime_y_zero_transform_bypass_flag"] = r.read(1)
        if r.read(1):  # seq_scaling_matrix_present_flag
            nlists = 8 if s["chroma_format_idc"] != 3 else 12
            lists = []
            for i in range(nlists):
                if r.read(1):
                    vals, dflt = _scaling_list_read(
                        r, 16 if i < 6 else 64
                    )
                    lists.append({"values": vals, "use_default": dflt})
                else:
                    lists.append(None)
            s["seq_scaling_lists"] = lists
    s["log2_max_frame_num_minus4"] = ue_read(r)
    s["pic_order_cnt_type"] = ue_read(r)
    if s["pic_order_cnt_type"] == 0:
        s["log2_max_pic_order_cnt_lsb_minus4"] = ue_read(r)
    elif s["pic_order_cnt_type"] == 1:
        s["delta_pic_order_always_zero_flag"] = r.read(1)
        s["offset_for_non_ref_pic"] = se_read(r)
        s["offset_for_top_to_bottom_field"] = se_read(r)
        n = ue_read(r)
        s["offset_for_ref_frame"] = [se_read(r) for _ in range(n)]
    elif s["pic_order_cnt_type"] > 2:
        raise ValueError("h264: pic_order_cnt_type > 2")
    s["max_num_ref_frames"] = ue_read(r)
    s["gaps_in_frame_num_value_allowed_flag"] = r.read(1)
    s["pic_width_in_mbs_minus1"] = ue_read(r)
    s["pic_height_in_map_units_minus1"] = ue_read(r)
    s["frame_mbs_only_flag"] = r.read(1)
    if not s["frame_mbs_only_flag"]:
        s["mb_adaptive_frame_field_flag"] = r.read(1)
    s["direct_8x8_inference_flag"] = r.read(1)
    s["frame_cropping_flag"] = r.read(1)
    if s["frame_cropping_flag"]:
        s["frame_crop"] = tuple(ue_read(r) for _ in range(4))
    if r.read(1):  # vui_parameters_present_flag
        s["vui"] = _vui_read(r)
    rbsp_trailing_check(r, len(rbsp))
    return s


def encode_sps(s: dict) -> bytes:
    w = _BitWriter()
    w.write(s["profile_idc"], 8)
    w.write(s.get("constraint_set_flags", 0), 6)
    w.write(0, 2)
    w.write(s["level_idc"], 8)
    ue_write(w, s.get("seq_parameter_set_id", 0))
    if s["profile_idc"] in HIGH_PROFILES:
        ue_write(w, s["chroma_format_idc"])
        if s["chroma_format_idc"] == 3:
            w.write(s.get("separate_colour_plane_flag", 0), 1)
        ue_write(w, s.get("bit_depth_luma_minus8", 0))
        ue_write(w, s.get("bit_depth_chroma_minus8", 0))
        w.write(s.get("qpprime_y_zero_transform_bypass_flag", 0), 1)
        lists = s.get("seq_scaling_lists")
        w.write(int(lists is not None), 1)
        if lists is not None:
            for entry in lists:
                w.write(int(entry is not None), 1)
                if entry is not None:
                    _scaling_list_write(w, entry["values"])
    ue_write(w, s["log2_max_frame_num_minus4"])
    ue_write(w, s["pic_order_cnt_type"])
    if s["pic_order_cnt_type"] == 0:
        ue_write(w, s["log2_max_pic_order_cnt_lsb_minus4"])
    elif s["pic_order_cnt_type"] == 1:
        w.write(s["delta_pic_order_always_zero_flag"], 1)
        se_write(w, s["offset_for_non_ref_pic"])
        se_write(w, s["offset_for_top_to_bottom_field"])
        ue_write(w, len(s["offset_for_ref_frame"]))
        for off in s["offset_for_ref_frame"]:
            se_write(w, off)
    ue_write(w, s["max_num_ref_frames"])
    w.write(s["gaps_in_frame_num_value_allowed_flag"], 1)
    ue_write(w, s["pic_width_in_mbs_minus1"])
    ue_write(w, s["pic_height_in_map_units_minus1"])
    w.write(s["frame_mbs_only_flag"], 1)
    if not s["frame_mbs_only_flag"]:
        w.write(s.get("mb_adaptive_frame_field_flag", 0), 1)
    w.write(s.get("direct_8x8_inference_flag", 0), 1)
    w.write(s["frame_cropping_flag"], 1)
    if s["frame_cropping_flag"]:
        for x in s["frame_crop"]:
            ue_write(w, x)
    vui = s.get("vui")
    w.write(int(vui is not None), 1)
    if vui is not None:
        _vui_write(w, vui)
    rbsp_trailing_write(w)
    return bytes(w.out)


def sps_dimensions(s: dict) -> tuple[int, int]:
    """Decoded luma picture width/height after cropping (7.4.2.1.1):
    CropUnitX/Y depend on ChromaArrayType (0 when monochrome or
    separate colour planes)."""
    width = (s["pic_width_in_mbs_minus1"] + 1) * 16
    height = (
        (2 - s["frame_mbs_only_flag"])
        * (s["pic_height_in_map_units_minus1"] + 1)
        * 16
    )
    if s["frame_cropping_flag"]:
        chroma_array_type = (
            0
            if s["separate_colour_plane_flag"]
            else s["chroma_format_idc"]
        )
        if chroma_array_type == 0:
            cux, cuy = 1, 2 - s["frame_mbs_only_flag"]
        else:
            sw, sh = _SUB_WH[chroma_array_type]
            cux, cuy = sw, sh * (2 - s["frame_mbs_only_flag"])
        left, right, top, bottom = s["frame_crop"]
        width -= cux * (left + right)
        height -= cuy * (top + bottom)
    return width, height


# ---------------------------------------------------------------------------
# PPS (7.3.2.2)
# ---------------------------------------------------------------------------


def parse_pps(rbsp: bytes) -> dict:
    r = _BitReader(rbsp)
    p: dict = {
        "pic_parameter_set_id": ue_read(r),
        "seq_parameter_set_id": ue_read(r),
        "entropy_coding_mode_flag": r.read(1),
        "bottom_field_pic_order_in_frame_present_flag": r.read(1),
    }
    if ue_read(r) != 0:  # num_slice_groups_minus1
        raise NotImplementedError("h264: FMO (multiple slice groups)")
    p["num_ref_idx_l0_default_active_minus1"] = ue_read(r)
    p["num_ref_idx_l1_default_active_minus1"] = ue_read(r)
    p["weighted_pred_flag"] = r.read(1)
    p["weighted_bipred_idc"] = r.read(2)
    p["pic_init_qp_minus26"] = se_read(r)
    p["pic_init_qs_minus26"] = se_read(r)
    p["chroma_qp_index_offset"] = se_read(r)
    p["deblocking_filter_control_present_flag"] = r.read(1)
    p["constrained_intra_pred_flag"] = r.read(1)
    p["redundant_pic_cnt_present_flag"] = r.read(1)
    # more_rbsp_data(): the tail is present iff payload bits remain
    # before the stop bit — locate the last set bit of the RBSP.
    total = len(rbsp) * 8
    stop = total
    while stop > 0:
        byte = rbsp[(stop - 1) // 8]
        if (byte >> (7 - ((stop - 1) % 8))) & 1:
            break
        stop -= 1
    used = r.pos * 8 - r._n
    if stop - 1 > used:
        p["transform_8x8_mode_flag"] = r.read(1)
        if r.read(1):  # pic_scaling_matrix_present_flag
            nlists = 6 + (2 if p["transform_8x8_mode_flag"] else 0)
            lists = []
            for i in range(nlists):
                if r.read(1):
                    vals, dflt = _scaling_list_read(
                        r, 16 if i < 6 else 64
                    )
                    lists.append({"values": vals, "use_default": dflt})
                else:
                    lists.append(None)
            p["pic_scaling_lists"] = lists
        p["second_chroma_qp_index_offset"] = se_read(r)
    rbsp_trailing_check(r, len(rbsp))
    return p


def encode_pps(p: dict) -> bytes:
    w = _BitWriter()
    ue_write(w, p["pic_parameter_set_id"])
    ue_write(w, p["seq_parameter_set_id"])
    w.write(p["entropy_coding_mode_flag"], 1)
    w.write(p["bottom_field_pic_order_in_frame_present_flag"], 1)
    ue_write(w, 0)  # num_slice_groups_minus1 — FMO is a loud boundary
    ue_write(w, p["num_ref_idx_l0_default_active_minus1"])
    ue_write(w, p["num_ref_idx_l1_default_active_minus1"])
    w.write(p["weighted_pred_flag"], 1)
    w.write(p["weighted_bipred_idc"], 2)
    se_write(w, p["pic_init_qp_minus26"])
    se_write(w, p["pic_init_qs_minus26"])
    se_write(w, p["chroma_qp_index_offset"])
    w.write(p["deblocking_filter_control_present_flag"], 1)
    w.write(p["constrained_intra_pred_flag"], 1)
    w.write(p["redundant_pic_cnt_present_flag"], 1)
    if "transform_8x8_mode_flag" in p:
        w.write(p["transform_8x8_mode_flag"], 1)
        lists = p.get("pic_scaling_lists")
        w.write(int(lists is not None), 1)
        if lists is not None:
            for entry in lists:
                w.write(int(entry is not None), 1)
                if entry is not None:
                    _scaling_list_write(w, entry["values"])
        se_write(w, p["second_chroma_qp_index_offset"])
    rbsp_trailing_write(w)
    return bytes(w.out)


# ---------------------------------------------------------------------------
# Slice header (7.3.3) — parse stops AT slice data
# ---------------------------------------------------------------------------

SLICE_TYPES = {0: "P", 1: "B", 2: "I", 3: "SP", 4: "SI"}


def parse_slice_header(
    rbsp: bytes, sps: dict, pps: dict, nal_ref_idc: int, idr: bool
) -> dict:
    r = _BitReader(rbsp)
    h: dict = {
        "first_mb_in_slice": ue_read(r),
        "slice_type_code": ue_read(r),
        "pic_parameter_set_id": ue_read(r),
    }
    st = h["slice_type_code"] % 5
    if st > 4:
        raise ValueError("h264: slice_type > 9")
    h["slice_type"] = SLICE_TYPES[st]
    if st in (1, 3, 4):
        raise NotImplementedError(f"h264: {SLICE_TYPES[st]} slices")
    if sps["separate_colour_plane_flag"]:
        h["colour_plane_id"] = r.read(2)
    h["frame_num"] = r.read(sps["log2_max_frame_num_minus4"] + 4)
    h["field_pic_flag"] = 0
    if not sps["frame_mbs_only_flag"]:
        h["field_pic_flag"] = r.read(1)
        if h["field_pic_flag"]:
            h["bottom_field_flag"] = r.read(1)
    if idr:
        h["idr_pic_id"] = ue_read(r)
    if sps["pic_order_cnt_type"] == 0:
        h["pic_order_cnt_lsb"] = r.read(
            sps["log2_max_pic_order_cnt_lsb_minus4"] + 4
        )
        if (
            pps["bottom_field_pic_order_in_frame_present_flag"]
            and not h["field_pic_flag"]
        ):
            h["delta_pic_order_cnt_bottom"] = se_read(r)
    elif sps["pic_order_cnt_type"] == 1 and not sps[
        "delta_pic_order_always_zero_flag"
    ]:
        h["delta_pic_order_cnt"] = [se_read(r)]
        if (
            pps["bottom_field_pic_order_in_frame_present_flag"]
            and not h["field_pic_flag"]
        ):
            h["delta_pic_order_cnt"].append(se_read(r))
    if pps["redundant_pic_cnt_present_flag"]:
        h["redundant_pic_cnt"] = ue_read(r)
    if st == 0:  # P slice
        h["num_ref_idx_active_override_flag"] = r.read(1)
        if h["num_ref_idx_active_override_flag"]:
            h["num_ref_idx_l0_active_minus1"] = ue_read(r)
        if r.read(1):  # ref_pic_list_modification_flag_l0
            raise NotImplementedError(
                "h264: ref_pic_list_modification commands"
            )
        if pps["weighted_pred_flag"]:
            raise NotImplementedError("h264: prediction weight table")
    if nal_ref_idc != 0:
        if idr:
            h["no_output_of_prior_pics_flag"] = r.read(1)
            h["long_term_reference_flag"] = r.read(1)
        else:
            if r.read(1):  # adaptive_ref_pic_marking_mode_flag
                raise NotImplementedError("h264: adaptive MMCO marking")
    if pps["entropy_coding_mode_flag"] and st != 2:
        h["cabac_init_idc"] = ue_read(r)
    h["slice_qp_delta"] = se_read(r)
    if pps["deblocking_filter_control_present_flag"]:
        h["disable_deblocking_filter_idc"] = ue_read(r)
        if h["disable_deblocking_filter_idc"] != 1:
            h["slice_alpha_c0_offset_div2"] = se_read(r)
            h["slice_beta_offset_div2"] = se_read(r)
    h["header_bits"] = r.pos * 8 - r._n
    # Slice DATA (macroblock layer, CAVLC/CABAC to pixels) is the
    # documented boundary — the structural parse stops here.
    return h


def encode_slice_header(
    h: dict, sps: dict, pps: dict, nal_ref_idc: int, idr: bool
) -> bytes:
    """Fixture synthesis: pack the header fields, then one stop bit in
    place of slice data so the NAL is well-formed for framing tests."""
    w = _BitWriter()
    ue_write(w, h["first_mb_in_slice"])
    ue_write(w, h["slice_type_code"])
    ue_write(w, h["pic_parameter_set_id"])
    st = h["slice_type_code"] % 5
    if sps["separate_colour_plane_flag"]:
        w.write(h["colour_plane_id"], 2)
    w.write(h["frame_num"], sps["log2_max_frame_num_minus4"] + 4)
    if not sps["frame_mbs_only_flag"]:
        w.write(h.get("field_pic_flag", 0), 1)
        if h.get("field_pic_flag"):
            w.write(h["bottom_field_flag"], 1)
    if idr:
        ue_write(w, h["idr_pic_id"])
    if sps["pic_order_cnt_type"] == 0:
        w.write(
            h["pic_order_cnt_lsb"],
            sps["log2_max_pic_order_cnt_lsb_minus4"] + 4,
        )
        if (
            pps["bottom_field_pic_order_in_frame_present_flag"]
            and not h.get("field_pic_flag")
        ):
            se_write(w, h["delta_pic_order_cnt_bottom"])
    elif sps["pic_order_cnt_type"] == 1 and not sps[
        "delta_pic_order_always_zero_flag"
    ]:
        for d in h["delta_pic_order_cnt"]:
            se_write(w, d)
    if pps["redundant_pic_cnt_present_flag"]:
        ue_write(w, h["redundant_pic_cnt"])
    if st == 0:
        w.write(h.get("num_ref_idx_active_override_flag", 0), 1)
        if h.get("num_ref_idx_active_override_flag"):
            ue_write(w, h["num_ref_idx_l0_active_minus1"])
        w.write(0, 1)  # no ref_pic_list_modification
        if pps["weighted_pred_flag"]:
            raise NotImplementedError("h264: prediction weight table")
    if nal_ref_idc != 0:
        if idr:
            w.write(h.get("no_output_of_prior_pics_flag", 0), 1)
            w.write(h.get("long_term_reference_flag", 0), 1)
        else:
            w.write(0, 1)  # sliding-window marking
    if pps["entropy_coding_mode_flag"] and st != 2:
        ue_write(w, h["cabac_init_idc"])
    se_write(w, h["slice_qp_delta"])
    if pps["deblocking_filter_control_present_flag"]:
        ue_write(w, h["disable_deblocking_filter_idc"])
        if h["disable_deblocking_filter_idc"] != 1:
            se_write(w, h["slice_alpha_c0_offset_div2"])
            se_write(w, h["slice_beta_offset_div2"])
    rbsp_trailing_write(w)
    return bytes(w.out)


# ---------------------------------------------------------------------------
# Stream-level parse
# ---------------------------------------------------------------------------


def parse_annexb(stream: bytes) -> list[dict]:
    """Parse an Annex-B stream into a list of per-NAL dicts with the
    decoded SPS/PPS/slice-header payloads; SPS/PPS are tracked by id
    so later slices resolve their active parameter sets."""
    sps_by_id: dict[int, dict] = {}
    pps_by_id: dict[int, dict] = {}
    out = []
    for ebsp in split_annexb(stream):
        ref_idc, ntype = nal_header(ebsp)
        rbsp = ebsp_to_rbsp(ebsp[1:])
        rec: dict = {"nal_ref_idc": ref_idc, "nal_unit_type": ntype}
        if ntype == NAL_SPS:
            s = parse_sps(rbsp)
            sps_by_id[s["seq_parameter_set_id"]] = s
            rec["sps"] = s
        elif ntype == NAL_PPS:
            p = parse_pps(rbsp)
            pps_by_id[p["pic_parameter_set_id"]] = p
            rec["pps"] = p
        elif ntype in (NAL_SLICE, NAL_IDR):
            # peek the PPS id: first_mb ue, slice_type ue, pps_id ue
            r = _BitReader(rbsp)
            ue_read(r)
            ue_read(r)
            pid = ue_read(r)
            if pid not in pps_by_id:
                raise ValueError(f"h264: slice references unknown PPS {pid}")
            pps = pps_by_id[pid]
            sid = pps["seq_parameter_set_id"]
            if sid not in sps_by_id:
                raise ValueError(f"h264: PPS references unknown SPS {sid}")
            rec["slice"] = parse_slice_header(
                rbsp, sps_by_id[sid], pps, ref_idc, ntype == NAL_IDR
            )
        elif ntype in (NAL_SEI, NAL_AUD):
            rec["payload_bytes"] = len(rbsp)
        else:
            raise NotImplementedError(f"h264: NAL unit type {ntype}")
        out.append(rec)
    return out
