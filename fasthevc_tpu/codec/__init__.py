"""Host orchestration: TPU encoder top, GOP engine, decoder top.

Reference parity: HM TEncTop/TEncGOP/TEncSlice layer (SURVEY.md L4/L3),
redesigned TPU-first: a batched jit search stage decides partitions+modes
for the whole frame at once (SURVEY.md P5), a commit stage reproduces the
exact reconstruction, and the CABAC host engine serializes the bitstream.
"""
