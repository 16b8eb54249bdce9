"""fasthevc_tpu — a TPU-native HEVC (H.265) encoder/decoder framework.

Brand-new design (not a port) with the capabilities of the reference
project omricarmi/FastHEVC (HM-derived C++ encoder with learned fast
CU-partition decision modes; see SURVEY.md for the reconstructed layer map).

Package layout (SURVEY.md §7.4):
  spec/     -- NumPy spec-exact golden model: the oracle for every unit test
               and the conformance anchor (transforms, intra, CABAC, syntax).
  ops/      -- JAX/Pallas TPU kernels: batched transforms, intra prediction,
               SATD/SSE costs, RDO tree dynamic program, loop filters, MC.
  codec/    -- host orchestration: encoder top, GOP engine, decoder top.
  models/   -- flax fast-partition CNN (the FastHEVC "fast modes" analog,
               SURVEY.md E8) + self-distillation training.
  parallel/ -- ("gop","tile") device mesh, shard_map halo exchange,
               multi-host GOP-parallel driver (SURVEY.md §2.4).
  config/   -- dataclass configs + HM-style presets (all_intra,
               low_delay_p, random_access_gop16).
  cli/      -- encode / decode / bench entry points.
  utils/    -- YUV I/O, PSNR, BD-rate, logging.
  cabac_cpp/-- C++ host CABAC/bitstream engine (exact, sequential) behind
               ctypes; the TPU side uses a vectorized rate *estimator*.
"""

__version__ = "0.1.0"
