"""Codec families (reference L1 analog, SURVEY.md section 2.1).

Each sub-package exposes block/stream compress() and decompress() plus the
format's frame layer. The numpy implementations are the bit-exact host
reference; tpu7z.ops holds the shared device kernels.
"""
