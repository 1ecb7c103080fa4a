"""Shared guard for the vendored codecs' public decode boundaries.

Every decoder here parses UNTRUSTED bytes inside executor tasks; the
contract is "valid output or ``ValueError``" so callers (mapInPandas
operators, quarantine wrappers) can route bad blobs without pattern-
matching on incidental exception types. Internal parse code is free to
index/unpack optimistically — this boundary converts the mechanical
failure modes of walking a malformed buffer (``struct.error``, an
out-of-range index, a non-integer field, a codec error in a header
string) into ``ValueError`` with the original as ``__cause__``.
``ValueError`` itself (the deliberate, descriptive errors) passes
through untouched, as do real bugs (``TypeError``, ``KeyError``, ...)
— the net is deliberately narrow.
"""

from __future__ import annotations

import functools
import struct
import zlib

# Note: ZeroDivisionError is deliberately NOT in this tuple — decoders
# must validate zero divisors themselves (tiffcodec raises ValueError for
# RowsPerStrip < 1), so a genuine arithmetic bug is never misclassified
# as a bad-data row.
_PARSE_FAILURES = (
    struct.error,
    IndexError,
    OverflowError,
    UnicodeDecodeError,
    zlib.error,
)


def untrusted_decoder(fn):
    """Decorate a public decode/split entry point: mechanical parse
    failures on malformed input surface as ``ValueError``."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except ValueError:
            raise
        except _PARSE_FAILURES as exc:
            raise ValueError(
                f"{fn.__name__}: malformed input ({type(exc).__name__}: {exc})"
            ) from exc

    return wrapper
