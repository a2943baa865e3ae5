"""H.264 structural parsing: exp-Golomb, EBSP, SPS/PPS/slice round
trips, Annex-B framing, and the documented loud boundaries."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cam_etl_spark.multimodal import h264 as H
from cam_etl_spark.multimodal.mpegaudio import _BitReader, _BitWriter


# ---------------------------------------------------------------------------
# exp-Golomb
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(0, 1 << 20), min_size=1, max_size=40))
def test_ue_roundtrip(values):
    w = _BitWriter()
    for v in values:
        H.ue_write(w, v)
    w.write(1, 1)
    w.align()
    r = _BitReader(bytes(w.out))
    assert [H.ue_read(r) for _ in values] == values


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-(1 << 16), 1 << 16), min_size=1, max_size=40))
def test_se_roundtrip(values):
    w = _BitWriter()
    for v in values:
        H.se_write(w, v)
    w.write(1, 1)
    w.align()
    r = _BitReader(bytes(w.out))
    assert [H.se_read(r) for _ in values] == values


def test_ue_bits_matches_writer():
    for v in (0, 1, 2, 3, 7, 8, 255, 1 << 15):
        w = _BitWriter()
        H.ue_write(w, v)
        assert w.bits == H.ue_bits(v)


# ---------------------------------------------------------------------------
# EBSP / Annex-B
# ---------------------------------------------------------------------------


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_ebsp_roundtrip_and_legality(raw):
    eb = H.rbsp_to_ebsp(raw)
    assert H.ebsp_to_rbsp(eb) == raw
    # no start-code-emulating sequences survive
    for bad in (b"\x00\x00\x00", b"\x00\x00\x01", b"\x00\x00\x02"):
        assert bad not in eb


def test_ebsp_rejects_illegal_sequences():
    for tail in (0, 1, 2):
        with pytest.raises(ValueError):
            H.ebsp_to_rbsp(bytes([0, 0, tail]))


def test_annexb_split_mixed_start_codes():
    nals = [b"\x67\x42", b"\x68\xce", b"\x65\x88\x00"]
    stream = (
        b"\x00\x00\x00\x01" + nals[0]
        + b"\x00\x00\x01" + nals[1]
        + b"\x00\x00\x00\x01" + nals[2]
    )
    # NAL payloads ending in zeros: trailing zeros before the next start
    # code belong to the start code, so compare with them stripped
    got = H.split_annexb(stream)
    assert got[0] == nals[0] and got[1] == nals[1]
    assert got[2] == nals[2].rstrip(b"\x00")
    with pytest.raises(ValueError):
        H.split_annexb(b"\x00\x01\x02\x03")  # no start code


# ---------------------------------------------------------------------------
# SPS / PPS / slice round trips
# ---------------------------------------------------------------------------


def _mk_sps(draw):
    profile = draw(st.sampled_from([66, 77, 100]))
    high = profile in H.HIGH_PROFILES
    chroma = draw(st.integers(1, 3)) if high else 1
    sep = draw(st.integers(0, 1)) if chroma == 3 else 0
    fmof = draw(st.integers(0, 1))
    poc = draw(st.integers(0, 2))
    s = {
        "profile_idc": profile,
        "constraint_set_flags": draw(st.integers(0, 63)),
        "level_idc": draw(st.sampled_from([10, 30, 41, 52])),
        "seq_parameter_set_id": draw(st.integers(0, 31)),
        "chroma_format_idc": chroma,
        "separate_colour_plane_flag": sep,
        "log2_max_frame_num_minus4": draw(st.integers(0, 12)),
        "pic_order_cnt_type": poc,
        "max_num_ref_frames": draw(st.integers(0, 16)),
        "gaps_in_frame_num_value_allowed_flag": draw(st.integers(0, 1)),
        "pic_width_in_mbs_minus1": draw(st.integers(0, 255)),
        "pic_height_in_map_units_minus1": draw(st.integers(0, 255)),
        "frame_mbs_only_flag": fmof,
        "direct_8x8_inference_flag": draw(st.integers(0, 1)),
        "frame_cropping_flag": draw(st.integers(0, 1)),
    }
    if high:
        s["bit_depth_luma_minus8"] = draw(st.integers(0, 6))
        s["bit_depth_chroma_minus8"] = draw(st.integers(0, 6))
        s["qpprime_y_zero_transform_bypass_flag"] = draw(st.integers(0, 1))
        if draw(st.booleans()):
            nl = 12 if chroma == 3 else 8
            s["seq_scaling_lists"] = [
                {
                    "values": draw(
                        st.lists(
                            st.integers(1, 255),
                            min_size=16 if i < 6 else 64,
                            max_size=16 if i < 6 else 64,
                        )
                    ),
                    "use_default": False,
                }
                if draw(st.booleans())
                else None
                for i in range(nl)
            ]
    if not fmof:
        s["mb_adaptive_frame_field_flag"] = draw(st.integers(0, 1))
    if s["frame_cropping_flag"]:
        s["frame_crop"] = tuple(draw(st.integers(0, 3)) for _ in range(4))
    if poc == 0:
        s["log2_max_pic_order_cnt_lsb_minus4"] = draw(st.integers(0, 12))
    elif poc == 1:
        s["delta_pic_order_always_zero_flag"] = draw(st.integers(0, 1))
        s["offset_for_non_ref_pic"] = draw(st.integers(-128, 127))
        s["offset_for_top_to_bottom_field"] = draw(st.integers(-128, 127))
        s["offset_for_ref_frame"] = draw(
            st.lists(st.integers(-128, 127), max_size=4)
        )
    if draw(st.booleans()):
        vui = {"pic_struct_present_flag": draw(st.integers(0, 1))}
        if draw(st.booleans()):
            idc = draw(st.integers(0, 255))
            vui["aspect_ratio_idc"] = idc
            if idc == 255:
                vui["sar"] = (
                    draw(st.integers(0, 65535)),
                    draw(st.integers(0, 65535)),
                )
        if draw(st.booleans()):
            vui["num_units_in_tick"] = draw(st.integers(1, 1 << 31))
            vui["time_scale"] = draw(st.integers(1, 1 << 31))
            vui["fixed_frame_rate_flag"] = draw(st.integers(0, 1))
        if draw(st.booleans()):
            vui["nal_hrd"] = {
                "cpb_cnt": draw(st.integers(1, 4)),
                "bit_rate_scale": draw(st.integers(0, 15)),
                "cpb_size_scale": draw(st.integers(0, 15)),
                "initial_cpb_removal_delay_length": draw(
                    st.integers(1, 32)
                ),
                "cpb_removal_delay_length": draw(st.integers(1, 32)),
                "dpb_output_delay_length": draw(st.integers(1, 32)),
                "time_offset_length": draw(st.integers(0, 31)),
            }
            vui["nal_hrd"]["cpb"] = [
                (
                    draw(st.integers(0, 1 << 20)),
                    draw(st.integers(0, 1 << 20)),
                    draw(st.integers(0, 1)),
                )
                for _ in range(vui["nal_hrd"]["cpb_cnt"])
            ]
            vui["low_delay_hrd_flag"] = draw(st.integers(0, 1))
        if draw(st.booleans()):
            vui["bitstream_restriction"] = {
                "motion_vectors_over_pic_boundaries_flag": draw(
                    st.integers(0, 1)
                ),
                "max_bytes_per_pic_denom": draw(st.integers(0, 16)),
                "max_bits_per_mb_denom": draw(st.integers(0, 16)),
                "log2_max_mv_length_horizontal": draw(st.integers(0, 16)),
                "log2_max_mv_length_vertical": draw(st.integers(0, 16)),
                "max_num_reorder_frames": draw(st.integers(0, 16)),
                "max_dec_frame_buffering": draw(st.integers(0, 16)),
            }
        s["vui"] = vui
    return s


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_sps_roundtrip(data):
    sps = _mk_sps(data.draw)
    back = H.parse_sps(H.encode_sps(sps))
    for k, v in sps.items():
        got = back.get(k)
        if isinstance(v, tuple):
            assert got == tuple(v), (k, v, got)
        else:
            assert got == v, (k, v, got)
    w, h = H.sps_dimensions(back)
    assert w > 0 and h > 0


@settings(max_examples=150, deadline=None)
@given(st.data())
def test_pps_and_slice_roundtrip(data):
    draw = data.draw
    sps = _mk_sps(draw)
    pps = {
        "pic_parameter_set_id": draw(st.integers(0, 255)),
        "seq_parameter_set_id": sps["seq_parameter_set_id"],
        "entropy_coding_mode_flag": draw(st.integers(0, 1)),
        "bottom_field_pic_order_in_frame_present_flag": draw(
            st.integers(0, 1)
        ),
        "num_ref_idx_l0_default_active_minus1": draw(st.integers(0, 31)),
        "num_ref_idx_l1_default_active_minus1": draw(st.integers(0, 31)),
        "weighted_pred_flag": 0,
        "weighted_bipred_idc": draw(st.integers(0, 2)),
        "pic_init_qp_minus26": draw(st.integers(-26, 25)),
        "pic_init_qs_minus26": draw(st.integers(-26, 25)),
        "chroma_qp_index_offset": draw(st.integers(-12, 12)),
        "deblocking_filter_control_present_flag": draw(st.integers(0, 1)),
        "constrained_intra_pred_flag": draw(st.integers(0, 1)),
        "redundant_pic_cnt_present_flag": draw(st.integers(0, 1)),
    }
    if draw(st.booleans()):
        pps["transform_8x8_mode_flag"] = draw(st.integers(0, 1))
        pps["second_chroma_qp_index_offset"] = draw(st.integers(-12, 12))
    backp = H.parse_pps(H.encode_pps(pps))
    for k, v in pps.items():
        assert backp.get(k) == v, (k, v)
    if "transform_8x8_mode_flag" not in pps:
        assert "transform_8x8_mode_flag" not in backp

    idr = draw(st.booleans())
    ref_idc = 3 if idr else draw(st.integers(0, 3))
    hdr = {
        "first_mb_in_slice": draw(st.integers(0, 100)),
        "slice_type_code": (7 if idr else draw(st.sampled_from([0, 2, 5, 7]))),
        "pic_parameter_set_id": pps["pic_parameter_set_id"],
        "frame_num": 0
        if idr
        else draw(
            st.integers(0, (1 << (sps["log2_max_frame_num_minus4"] + 4)) - 1)
        ),
        "field_pic_flag": 0,
        "slice_qp_delta": draw(st.integers(-10, 10)),
    }
    st_code = hdr["slice_type_code"] % 5
    if sps["separate_colour_plane_flag"]:
        hdr["colour_plane_id"] = draw(st.integers(0, 2))
    if idr:
        hdr["idr_pic_id"] = draw(st.integers(0, 65535))
    if sps["pic_order_cnt_type"] == 0:
        hdr["pic_order_cnt_lsb"] = draw(
            st.integers(
                0, (1 << (sps["log2_max_pic_order_cnt_lsb_minus4"] + 4)) - 1
            )
        )
        if pps["bottom_field_pic_order_in_frame_present_flag"]:
            hdr["delta_pic_order_cnt_bottom"] = draw(st.integers(-8, 8))
    elif sps["pic_order_cnt_type"] == 1 and not sps[
        "delta_pic_order_always_zero_flag"
    ]:
        hdr["delta_pic_order_cnt"] = [draw(st.integers(-8, 8))] + (
            [draw(st.integers(-8, 8))]
            if pps["bottom_field_pic_order_in_frame_present_flag"]
            else []
        )
    if pps["redundant_pic_cnt_present_flag"]:
        hdr["redundant_pic_cnt"] = draw(st.integers(0, 3))
    if st_code == 0:
        hdr["num_ref_idx_active_override_flag"] = draw(st.integers(0, 1))
        if hdr["num_ref_idx_active_override_flag"]:
            hdr["num_ref_idx_l0_active_minus1"] = draw(st.integers(0, 31))
        if pps["entropy_coding_mode_flag"]:
            hdr["cabac_init_idc"] = draw(st.integers(0, 2))
    if ref_idc != 0 and idr:
        hdr["no_output_of_prior_pics_flag"] = draw(st.integers(0, 1))
        hdr["long_term_reference_flag"] = draw(st.integers(0, 1))
    if pps["deblocking_filter_control_present_flag"]:
        hdr["disable_deblocking_filter_idc"] = draw(st.integers(0, 2))
        if hdr["disable_deblocking_filter_idc"] != 1:
            hdr["slice_alpha_c0_offset_div2"] = draw(st.integers(-6, 6))
            hdr["slice_beta_offset_div2"] = draw(st.integers(-6, 6))
    rb = H.encode_slice_header(hdr, sps, pps, ref_idc, idr)
    back = H.parse_slice_header(rb, sps, pps, ref_idc, idr)
    for k, v in hdr.items():
        assert back.get(k) == v, (k, v, back.get(k))
    assert back["header_bits"] <= len(rb) * 8

    # full Annex-B stream through parse_annexb (exercises emulation
    # prevention with real parameter-set payloads)
    stream = H.annexb_stream(
        [
            H.make_nal(3, H.NAL_SPS, H.encode_sps(sps)),
            H.make_nal(3, H.NAL_PPS, H.encode_pps(pps)),
            H.make_nal(ref_idc, H.NAL_IDR if idr else H.NAL_SLICE, rb),
        ]
    )
    recs = H.parse_annexb(stream)
    assert recs[2]["slice"]["slice_type_code"] == hdr["slice_type_code"]


def test_known_dimensions():
    base = {
        "profile_idc": 66,
        "level_idc": 31,
        "seq_parameter_set_id": 0,
        "log2_max_frame_num_minus4": 0,
        "pic_order_cnt_type": 2,
        "max_num_ref_frames": 1,
        "gaps_in_frame_num_value_allowed_flag": 0,
        "frame_mbs_only_flag": 1,
        "direct_8x8_inference_flag": 1,
    }
    s720 = dict(
        base,
        pic_width_in_mbs_minus1=79,
        pic_height_in_map_units_minus1=44,
        frame_cropping_flag=0,
    )
    assert H.sps_dimensions(H.parse_sps(H.encode_sps(s720))) == (1280, 720)
    # 1920x1080: 120x68 MBs, crop 8 luma rows bottom (4 crop units at 4:2:0)
    s1080 = dict(
        base,
        pic_width_in_mbs_minus1=119,
        pic_height_in_map_units_minus1=67,
        frame_cropping_flag=1,
        frame_crop=(0, 0, 0, 4),
    )
    assert H.sps_dimensions(H.parse_sps(H.encode_sps(s1080))) == (1920, 1080)


# ---------------------------------------------------------------------------
# Boundaries: loud, never mis-parsed
# ---------------------------------------------------------------------------


def test_boundaries():
    with pytest.raises(ValueError):
        H.nal_header(b"\x80")  # forbidden_zero_bit
    for t in (2, 3, 4, 14, 15, 20):
        with pytest.raises(NotImplementedError):
            H.nal_header(bytes([t]))
    # FMO: num_slice_groups_minus1 > 0
    w = _BitWriter()
    for _ in range(2):
        H.ue_write(w, 0)
    w.write(0, 2)
    H.ue_write(w, 1)
    w.write(1, 1)
    w.align()
    with pytest.raises(NotImplementedError):
        H.parse_pps(bytes(w.out))
    # truncated SPS
    with pytest.raises(ValueError):
        H.parse_sps(b"\x42\x00")
    # exp-Golomb runaway on all-zero input
    with pytest.raises(ValueError):
        H.ue_read(_BitReader(b"\x00" * 8))
    # missing stop bit
    w2 = _BitWriter()
    H.ue_write(w2, 0)
    H.ue_write(w2, 0)
    w2.write(0, 2)
    H.ue_write(w2, 0)  # num_slice_groups ok
    with pytest.raises(ValueError):
        H.parse_pps(bytes(w2.out) + b"\x00\x00\x00\x00\x00")
    # slice referencing unknown PPS
    sps = {
        "profile_idc": 66, "level_idc": 30, "seq_parameter_set_id": 0,
        "log2_max_frame_num_minus4": 0, "pic_order_cnt_type": 2,
        "max_num_ref_frames": 0, "gaps_in_frame_num_value_allowed_flag": 0,
        "pic_width_in_mbs_minus1": 9, "pic_height_in_map_units_minus1": 9,
        "frame_mbs_only_flag": 1, "direct_8x8_inference_flag": 0,
        "frame_cropping_flag": 0,
    }
    w3 = _BitWriter()
    for v in (0, 7, 5):  # first_mb, slice_type I(7), pps_id 5 (unknown)
        H.ue_write(w3, v)
    w3.write(1, 1)
    w3.align()
    stream = H.annexb_stream(
        [H.make_nal(3, H.NAL_SPS, H.encode_sps(sps)),
         H.make_nal(3, H.NAL_IDR, bytes(w3.out))]
    )
    with pytest.raises(ValueError):
        H.parse_annexb(stream)
    # B/SP/SI slices are a named boundary
    pps = {
        "pic_parameter_set_id": 0, "seq_parameter_set_id": 0,
        "entropy_coding_mode_flag": 0,
        "bottom_field_pic_order_in_frame_present_flag": 0,
        "num_ref_idx_l0_default_active_minus1": 0,
        "num_ref_idx_l1_default_active_minus1": 0,
        "weighted_pred_flag": 0, "weighted_bipred_idc": 0,
        "pic_init_qp_minus26": 0, "pic_init_qs_minus26": 0,
        "chroma_qp_index_offset": 0,
        "deblocking_filter_control_present_flag": 0,
        "constrained_intra_pred_flag": 0,
        "redundant_pic_cnt_present_flag": 0,
    }
    for code in (1, 3, 4):  # B, SP, SI
        w4 = _BitWriter()
        for v in (0, code, 0):
            H.ue_write(w4, v)
        w4.write(1, 1)
        w4.align()
        with pytest.raises(NotImplementedError):
            H.parse_slice_header(bytes(w4.out), sps, pps, 2, False)
