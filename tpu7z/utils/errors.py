"""Error model.

The reference uses SRes (C) / HRESULT (C++) return codes with first-error-wins
aggregation across MT workers (reference: C/7zTypes.h, C/MtDec.h:24-37).
Here errors are exceptions on the host control path; device-side kernels
report via error flags that are reduced with a collective (see
tpu7z.parallel.progress).
"""


class TpuzError(Exception):
    """Base class for all tpu7z errors (SRes analog)."""


class CorruptError(TpuzError):
    """Input stream violates the format (SZ_ERROR_DATA analog)."""


class UnsupportedError(TpuzError):
    """Valid but unsupported feature (SZ_ERROR_UNSUPPORTED analog)."""


class DstTooSmallError(TpuzError):
    """Output buffer too small (SZ_ERROR_OUTPUT_EOF analog)."""


class ParamError(TpuzError):
    """Bad parameter (SZ_ERROR_PARAM analog)."""
