"""gzip (RFC 1952) member header construction.

Equivalent of the external ``gzip-header`` crate's ``GzBuilder`` used by the
reference (lib.rs:241-267, writer.rs:331-384): mtime / OS / extra / filename /
comment fields with the same semantics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

FTEXT, FHCRC, FEXTRA, FNAME, FCOMMENT = 1, 2, 4, 8, 16
OS_UNIX = 3
OS_UNKNOWN = 255


@dataclass
class GzBuilder:
    """Builder for a gzip member header."""

    mtime: int = 0
    os: int = OS_UNIX
    xfl: int = 0
    extra: bytes | None = None
    filename: bytes | None = None
    comment: bytes | None = None

    def with_mtime(self, mtime: int) -> "GzBuilder":
        self.mtime = int(mtime)
        return self

    def with_os(self, os_code: int) -> "GzBuilder":
        self.os = os_code
        return self

    def with_extra(self, extra: bytes) -> "GzBuilder":
        extra = bytes(extra)
        if len(extra) > 0xFFFF:
            # XLEN is a 2-byte field (RFC 1952 §2.3.1); fail here rather
            # than as an opaque OverflowError inside header_bytes().
            raise ValueError(f"gzip extra field too long ({len(extra)} > 65535)")
        self.extra = extra
        return self

    def with_filename(self, name: bytes | str) -> "GzBuilder":
        name = name.encode("latin-1") if isinstance(name, str) else bytes(name)
        if b"\x00" in name:
            raise ValueError("gzip filename may not contain NUL")
        self.filename = name
        return self

    def with_comment(self, comment: bytes | str) -> "GzBuilder":
        comment = comment.encode("latin-1") if isinstance(comment, str) else bytes(comment)
        if b"\x00" in comment:
            raise ValueError("gzip comment may not contain NUL")
        self.comment = comment
        return self

    def header_bytes(self) -> bytes:
        flg = 0
        if self.extra is not None:
            flg |= FEXTRA
        if self.filename is not None:
            flg |= FNAME
        if self.comment is not None:
            flg |= FCOMMENT
        out = bytearray()
        out += b"\x1f\x8b\x08"  # magic + CM=deflate
        out.append(flg)
        out += self.mtime.to_bytes(4, "little")
        out.append(self.xfl & 0xFF)
        out.append(self.os & 0xFF)
        if self.extra is not None:
            out += len(self.extra).to_bytes(2, "little") + self.extra
        if self.filename is not None:
            out += self.filename + b"\x00"
        if self.comment is not None:
            out += self.comment + b"\x00"
        return bytes(out)
