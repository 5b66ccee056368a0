"""Archive-container probes: ZIP central directory, ustar TAR headers.

Corpus deliveries arrive as archives (arXiv dumps, code corpora,
Common Crawl segment bundles), and the ingest step before any text
work is member enumeration — names, sizes, storage methods — without
extracting anything. These walks parse the container formats
directly (APPNOTE.TXT for ZIP, POSIX ustar for TAR) rather than
delegating to stdlib zipfile/tarfile, so a truncated central
directory or a corrupted header checksum is a LOUD error the
quarantine path can route; the stdlib implementations are used only
on the other side of the contract (fixture fabrication and test
cross-checks), which makes the parse genuinely independent.

- ``parse_zip``: locate the end-of-central-directory record
  (backward scan bounded by the max comment length), then walk the
  central file headers: per-member name, compression method,
  compressed/uncompressed sizes. Honors the entry count and offset
  fields rather than scanning for signatures.
- ``parse_tar``: walk 512-byte blocks: name, octal size field,
  the header CHECKSUM (sum of header bytes with the checksum field
  blanked — verified, not trusted), typeflag, end-of-archive zero
  blocks, size-rounded member skips.

Scalar by design — they run inside Arrow mapInPandas batches
(multimodal.extract_zip_stats / extract_tar_stats).
"""

from __future__ import annotations

import struct

_EOCD_SIG = b"PK\x05\x06"
_CDFH_SIG = b"PK\x01\x02"


def parse_zip(payload: bytes) -> dict:
    """Central-directory walk: returns member count, total
    compressed/uncompressed bytes, stored-member (method 0) count,
    and the member names in directory order."""
    n = len(payload)
    # EOCD is within the last 22 + 65535 bytes (max comment length)
    start = max(0, n - 22 - 65535)
    pos = payload.rfind(_EOCD_SIG, start)
    if pos < 0 or pos + 22 > n:
        raise ValueError("zip: missing end-of-central-directory record")
    (
        _disk,
        _cd_disk,
        _n_disk,
        n_entries,
        _cd_size,
        cd_off,
        _clen,
    ) = struct.unpack_from("<HHHHIIH", payload, pos + 4)
    # ZIP64 archives store sentinel values here and the real numbers in
    # the ZIP64 EOCD record; summing the sentinels would silently
    # report wrong counts — loud error per the quarantine design
    if n_entries == 0xFFFF or cd_off == 0xFFFFFFFF or _cd_size == 0xFFFFFFFF:
        raise ValueError("zip: ZIP64 archive not supported")
    members = []
    total_c = total_u = n_stored = 0
    p = cd_off
    for _ in range(n_entries):
        if payload[p : p + 4] != _CDFH_SIG:
            raise ValueError("zip: bad central file header signature")
        (method,) = struct.unpack_from("<H", payload, p + 10)
        csize, usize = struct.unpack_from("<II", payload, p + 20)
        fnlen, extralen, clen = struct.unpack_from("<HHH", payload, p + 28)
        name_start = p + 46
        if name_start + fnlen > n:
            raise ValueError("zip: truncated central directory")
        members.append(
            payload[name_start : name_start + fnlen].decode(
                "utf-8", "replace"
            )
        )
        total_c += csize
        total_u += usize
        if method == 0:
            n_stored += 1
        p = name_start + fnlen + extralen + clen
    return {
        "n_members": n_entries,
        "total_compressed": total_c,
        "total_uncompressed": total_u,
        "n_stored": n_stored,
        "members": members,
    }


def parse_tar(payload: bytes) -> dict:
    """ustar block walk with checksum VERIFICATION: returns regular-
    file member count, total file bytes, and member names. Stops at
    the end-of-archive zero blocks; raises on a bad checksum or a
    truncated member."""
    n = len(payload)
    pos = 0
    members = []
    total = 0
    n_files = 0
    while pos + 512 <= n:
        block = payload[pos : pos + 512]
        if block == b"\x00" * 512:
            break  # end-of-archive marker
        stored = block[148:156]
        try:
            chksum = int(stored.split(b"\x00")[0].strip() or b"0", 8)
        except ValueError:
            raise ValueError("tar: unparseable checksum field")
        calc = sum(block[:148]) + 8 * 0x20 + sum(block[156:])
        if calc != chksum:
            raise ValueError(
                f"tar: checksum mismatch at block {pos // 512}"
            )
        name = block[:100].split(b"\x00")[0].decode("utf-8", "replace")
        size_field = block[124:136].split(b"\x00")[0].strip()
        size = int(size_field or b"0", 8)
        typeflag = block[156:157]
        data_blocks = (size + 511) // 512
        if pos + 512 + data_blocks * 512 > n:
            raise ValueError(f"tar: truncated member {name!r}")
        if typeflag in (b"0", b"\x00"):
            members.append(name)
            total += size
            n_files += 1
        pos += 512 + data_blocks * 512
    if n_files == 0:
        raise ValueError("tar: no regular-file members")
    return {
        "n_members": n_files,
        "total_file_bytes": total,
        "members": members,
    }
