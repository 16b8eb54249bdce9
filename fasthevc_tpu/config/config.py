"""Encoder/decoder configuration.

Reference parity: HM TAppEncCfg + program_options_lite (SURVEY.md E2, §5.6),
redesigned as plain dataclasses with the three canonical HM-style presets
(BASELINE.md configs): all_intra, low_delay_p, random_access_gop16.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass
class GopEntry:
    """One entry of the GOP structure table (HM cfg Frame1..FrameN analog)."""
    poc_offset: int          # coding order -> display order offset in GOP
    qp_offset: int
    slice_type: str          # "I" | "P" | "B"
    ref_pocs: tuple = ()     # reference POC deltas (negative = past)
    temporal_id: int = 0


@dataclass
class EncoderConfig:
    width: int = 416
    height: int = 240
    qp: int = 32
    frames: int = 8

    # Structure
    log2_ctu: int = 5            # CTU size (32 default; 64 supported)
    log2_min_cu: int = 3         # min CU 8x8
    log2_min_tu: int = 2         # min TU 4x4
    log2_max_tu: int = 5         # max TU 32x32
    bit_depth: int = 8

    # GOP / prediction structure
    intra_period: int = -1       # -1: only first frame is IDR
    gop: list = field(default_factory=list)  # empty => all-intra

    # Tiles (uniform spacing); 1x1 = disabled
    tile_cols: int = 1
    tile_rows: int = 1
    # Multi-slice (SURVEY.md P3): split each picture into N independent
    # slice segments on CTU-row boundaries, each its own NAL with its own
    # CABAC init and slice-boundary-constrained prediction. 1 = off.
    # Mutually exclusive with tiles (validate()).
    slices: int = 1
    # Wavefront parallel processing (SURVEY.md P2,
    # entropy_coding_sync_enabled_flag): per-CTU-row CABAC substreams,
    # contexts inherited from the row above's second CTB. Prediction is
    # unconstrained (unlike tiles/slices), so WPP is compression-neutral
    # up to the per-row context resets. Mutually exclusive with tiles.
    wpp: bool = False

    # Tools
    lossless: bool = False       # transquant bypass (cu level, all CUs)
    deblocking: bool = True
    sao: bool = True
    # RDOQ is on by default: the spec tier runs the exact HM-style
    # trellis, the native tier its byte-identical C++ port, and the
    # device tier the parallel closed-form trellis (ops/rdoq.py) — the
    # tiers are each conformant but not byte-identical under RDOQ
    # (encoder freedom); cross-tier byte-identity tests set rdoq=False.
    rdoq: bool = True
    # Two-pass recon-reference intra search (SURVEY.md §7.3.3): pass 1
    # searches with source-pixel references, commits, then pass 2
    # re-searches with the pass-1 RECONSTRUCTION as the intra reference
    # samples and commits that. Closes most of the source-vs-recon
    # reference RD gap at ~2x intra search+commit cost.
    search_recon_refs: bool = False
    transform_skip: bool = False  # 4x4 TB transform_skip (spec 7.3.8.11; SpecEncoder searches it)
    # depth-1 residual quadtree for inter CUs (spec 7.3.8.8
    # split_transform_flag): 32->4x16 / 16->4x8 TU splits, RD-searched at
    # commit on the classic/native path (device commits keep TU == CU and
    # code the flag as 0 - encoder freedom, conformance unaffected)
    rqt_inter: bool = True
    # depth-1 residual quadtree for INTRA CUs (split_transform_flag on
    # 2Nx2N intra CUs of 16/32): 4 sub-TBs predicted sequentially from
    # each other's reconstruction. Spec tier (SpecEncoder RD-searches
    # it; decoder always supports it); TpuEncoder raises when set.
    rqt_intra: bool = False
    sign_data_hiding: bool = True  # SDH (PPS flag; off under lossless)
    # Quantization scaling lists (SURVEY.md C2/C5): the spec default
    # matrices (Table 7-5/7-6, HM `ScalingList=1`) shape quantization
    # toward the perceptual weighting for 8x8+ TBs. Spec tier; the
    # TpuEncoder raises (its trellis/device quantizers assume flat).
    scaling_lists: bool = False
    strong_intra_smoothing: bool = False
    hash_type: int = 0           # decoded-picture-hash SEI: 0 MD5/1 CRC/2 checksum

    # PART_NxN intra partitions at min CU (4x4 PUs + DST-VII luma TBs).
    # SpecEncoder searches them when enabled; decoder always supports them.
    nxn_intra: bool = False

    # Search / speed
    full_rdo: bool = True        # exhaustive partition search
    num_intra_rd_candidates: int = 3   # RMD shortlist depth (HM-style)
    search_range: int = 64
    fast_partition: bool = False # use the learned partition pruning model

    # Inter prediction structure
    num_ref_per_list: int = 2    # active references per list (HM CTC: 2+)
    temporal_mvp: bool = True    # TMVP merge/AMVP candidates (SPS flag)
    # Explicit weighted prediction (SURVEY.md E13, HM WeightedPredP/B):
    # per-slice DC/AC weight estimation vs each active reference, applied
    # when it beats the default weighted sample process in SAD (fades).
    # Sets BOTH PPS flags (weighted_pred for P, weighted_bipred for B).
    weighted_pred: bool = False

    # Rate control (0 = fixed QP); frame_rate feeds the R-lambda bit
    # budget (bits/frame = target_bitrate / frame_rate) on both the
    # classic and device RC paths
    target_bitrate: int = 0
    frame_rate: float = 30.0
    # HRD signalling (SURVEY.md E12): VUI timing + nal_hrd_parameters in
    # the SPS, buffering-period SEI on IRAPs, pic-timing SEI per picture
    hrd: bool = False

    # Frames per device dispatch on the all-intra pipelines (0 = default).
    # Larger groups amortize the fixed per-op overhead of the wavefront
    # commit chain and the device tunnel latency at the cost of memory.
    frame_group: int = 0

    def validate(self) -> None:
        assert self.width % 2 == 0 and self.height % 2 == 0
        assert 4 <= self.log2_ctu <= 6
        assert self.log2_min_cu == 3
        assert 0 <= self.qp <= 51
        if self.slices > 1:
            assert self.tile_cols == 1 and self.tile_rows == 1, \
                "multi-slice and tiles are mutually exclusive"
            assert self.slices <= self.ctus_y, \
                "more slices than CTU rows"
        if self.wpp:
            assert self.tile_cols == 1 and self.tile_rows == 1, \
                "WPP and tiles are mutually exclusive (spec allows it; " \
                "this encoder does not emit the combination)"
            assert self.slices == 1, "WPP with multi-slice unsupported"

    @property
    def ctu_size(self) -> int:
        return 1 << self.log2_ctu

    @property
    def ctus_x(self) -> int:
        return (self.width + self.ctu_size - 1) >> self.log2_ctu

    @property
    def ctus_y(self) -> int:
        return (self.height + self.ctu_size - 1) >> self.log2_ctu

    def replace(self, **kw) -> "EncoderConfig":
        return dataclasses.replace(self, **kw)


def quality(cfg: EncoderConfig) -> EncoderConfig:
    """The slow/quality search preset (HM `--preset placebo` analog):
    two-pass recon-reference intra search + a deeper true-RD shortlist.
    ~2x intra search+commit cost; measured BD-rate vs the oracle improves
    from ~10.5% to ~8.9% all-intra (tests/test_rd_gate.py quality gate)."""
    return cfg.replace(search_recon_refs=True, num_intra_rd_candidates=5)


def auto_tile_grid(width: int, height: int,
                   n_threads: int | None = None) -> tuple:
    """Speed-oriented tile grid (cols, rows) for the native slice engine.

    Tiles are this framework's intra-frame host parallelism unit (SURVEY.md
    P1); the grid tracks the machine's core count so tile threads neither
    starve nor oversubscribe, while keeping every tile CTU-aligned and large
    enough (>=256x128 luma) that the per-tile CABAC reset cost stays small.
    """
    if n_threads is None:
        import os
        n_threads = os.cpu_count() or 1
    cols, rows = 1, 1
    while cols * rows < n_threads:
        if width // (cols + 1) >= 256 and (cols + 1) * rows <= n_threads:
            cols += 1
            continue
        if height // (rows + 1) >= 128 and cols * (rows + 1) <= n_threads:
            rows += 1
            continue
        break
    return cols, rows


def all_intra(width=416, height=240, qp=32, frames=32, **kw) -> EncoderConfig:
    """BASELINE config #1 class: All-Intra."""
    return EncoderConfig(width=width, height=height, qp=qp, frames=frames,
                         intra_period=1, gop=[], **kw)


def low_delay_p(width=832, height=480, qp=32, frames=64, **kw) -> EncoderConfig:
    """BASELINE config #2 class: Low-delay P, GOP-4 QP cascade (HM LDP)."""
    gop = [
        GopEntry(1, 5, "P", (-1, -2, -3, -4)),
        GopEntry(2, 4, "P", (-1, -2, -3, -4)),
        GopEntry(3, 5, "P", (-1, -2, -3, -4)),
        GopEntry(4, 1, "P", (-1, -2, -3, -4)),
    ]
    return EncoderConfig(width=width, height=height, qp=qp, frames=frames,
                         intra_period=-1, gop=gop, **kw)


def random_access_gop16(width=1920, height=1080, qp=32, frames=128,
                        **kw) -> EncoderConfig:
    """BASELINE config #3 class: Random-access, hierarchical-B GOP-16."""
    # Hierarchical-B GOP-16 coding order and QP offsets (HM RA cfg shape).
    gop = [
        GopEntry(16, 1, "B", (-16, -32), 0),
        GopEntry(8, 1, "B", (-8, 8), 1),
        GopEntry(4, 4, "B", (-4, 4, 12), 2),
        GopEntry(2, 5, "B", (-2, 2, 6, 14), 3),
        GopEntry(1, 6, "B", (-1, 1, 3, 7), 4),
        GopEntry(3, 6, "B", (-1, -3, 1, 5), 4),
        GopEntry(6, 5, "B", (-2, -6, 2, 10), 3),
        GopEntry(5, 6, "B", (-1, -5, 1, 3), 4),
        GopEntry(7, 6, "B", (-1, -7, 1, 9), 4),
        GopEntry(12, 4, "B", (-4, -12, 4), 2),
        GopEntry(10, 5, "B", (-2, -10, 2, 6), 3),
        GopEntry(9, 6, "B", (-1, -9, 1, 7), 4),
        GopEntry(11, 6, "B", (-1, -11, 1, 5), 4),
        GopEntry(14, 5, "B", (-2, -14, 2), 3),
        GopEntry(13, 6, "B", (-1, -13, 1, 3), 4),
        GopEntry(15, 6, "B", (-1, -15, 1), 4),
    ]
    return EncoderConfig(width=width, height=height, qp=qp, frames=frames,
                         intra_period=32, gop=gop, **kw)


def random_access_gop16_layered(width=1920, height=1080, qp=32, frames=128,
                                **kw) -> EncoderConfig:
    """Random-access GOP-16 in TEMPORAL-LAYER coding order: all frames of
    a layer are coded consecutively (16; 8; 4,12; 2,6,10,14; odd).

    Same hierarchical references and QP cascade as random_access_gop16 —
    a legal alternative coding order (signaled explicitly via the per-
    slice ST-RPS) that lets the device pipeline dispatch every layer as
    ONE batch: the wavefront commit's per-wave cost is frame-count-
    invariant, so layer batches of 4-8 frames cut the per-frame cost ~4x
    versus the interleaved HM order (SURVEY.md §2.4 P4/P5).  Costs a
    deeper DPB (up to 9 held pictures vs HM's 5)."""
    gop = [
        GopEntry(16, 1, "B", (-16, -32), 0),
        GopEntry(8, 1, "B", (-8, 8), 1),
        GopEntry(4, 4, "B", (-4, 4, 12), 2),
        GopEntry(12, 4, "B", (-4, -12, 4), 2),
        GopEntry(2, 5, "B", (-2, 2, 6, 14), 3),
        GopEntry(6, 5, "B", (-2, -6, 2, 10), 3),
        GopEntry(10, 5, "B", (-2, -10, 2, 6), 3),
        GopEntry(14, 5, "B", (-2, -14, 2), 3),
        GopEntry(1, 6, "B", (-1, 1, 3, 7), 4),
        GopEntry(3, 6, "B", (-1, -3, 1, 5), 4),
        GopEntry(5, 6, "B", (-1, -5, 1, 3), 4),
        GopEntry(7, 6, "B", (-1, -7, 1, 9), 4),
        GopEntry(9, 6, "B", (-1, -9, 1, 7), 4),
        GopEntry(11, 6, "B", (-1, -11, 1, 5), 4),
        GopEntry(13, 6, "B", (-1, -13, 1, 3), 4),
        GopEntry(15, 6, "B", (-1, -15, 1), 4),
    ]
    return EncoderConfig(width=width, height=height, qp=qp, frames=frames,
                         intra_period=32, gop=gop, **kw)
