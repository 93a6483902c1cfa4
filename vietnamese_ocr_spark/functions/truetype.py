"""Minimal TrueType/OpenType `cmap` table parser (+ fixture writer).

Round-6 coverage item: a Type0/Identity-H PDF font WITHOUT a /ToUnicode
CMap has no spec-level text mapping, but when the font program is
EMBEDDED (/FontFile2) its own character-to-glyph `cmap` table can be
inverted — under Identity-H the CIDs in the content stream ARE glyph
ids, so gid->unicode recovers the text. This is what real extractors
(pdfminer, MuPDF) do before giving up. Built from the public OpenType
spec (sfnt directory; cmap subtable formats 4 and 12).

Only the `cmap` table is read — no glyf/hmtx/name parsing; anything
structurally off raises ValueError (callers quarantine the document).
Reference behavior: /root/reference/src/utils/inference.py ingests
rendered text only, so this path has no reference counterpart — it
serves the north_rule's PDF/layout-parse leg.
"""

from __future__ import annotations

import struct


def ttf_unicode_to_gid(data: bytes) -> dict[int, int]:
    """Parse an sfnt font's best Unicode `cmap` subtable into
    {codepoint: glyph_id}. Prefers format 12 (full Unicode) over
    format 4 (BMP)."""
    try:
        return _ttf_unicode_to_gid(data)
    except struct.error as ex:  # truncated tables -> quarantine contract
        raise ValueError(f"truncated font table: {ex}") from None


def _ttf_unicode_to_gid(data: bytes) -> dict[int, int]:
    if len(data) < 12:
        raise ValueError("truncated sfnt")
    tag = data[:4]
    if tag not in (b"\x00\x01\x00\x00", b"true", b"OTTO", b"ttcf"):
        raise ValueError("not a TrueType/OpenType font")
    if tag == b"ttcf":  # collection: first font's directory
        (off,) = struct.unpack_from(">I", data, 12)
    else:
        off = 0
    (num_tables,) = struct.unpack_from(">H", data, off + 4)
    cmap_off = None
    for i in range(num_tables):
        rec = off + 12 + 16 * i
        if rec + 16 > len(data):
            raise ValueError("truncated sfnt directory")
        if data[rec : rec + 4] == b"cmap":
            _, t_off, t_len = struct.unpack_from(">III", data, rec + 4)
            cmap_off = t_off
            break
    if cmap_off is None or cmap_off + 4 > len(data):
        raise ValueError("font has no cmap table")
    (n_enc,) = struct.unpack_from(">H", data, cmap_off + 2)
    best = None  # (priority, subtable offset)
    for i in range(n_enc):
        rec = cmap_off + 4 + 8 * i
        if rec + 8 > len(data):
            raise ValueError("truncated cmap encoding records")
        plat, enc, sub_off = struct.unpack_from(">HHI", data, rec)
        # Unicode-capable records: (0,*), (3,1) BMP, (3,10) full
        if plat == 0 or (plat == 3 and enc in (1, 10)):
            pri = 1 if (plat == 3 and enc == 10) or (plat == 0 and enc >= 4) else 0
            if best is None or pri > best[0]:
                best = (pri, cmap_off + sub_off)
    if best is None:
        raise ValueError("font cmap has no Unicode subtable")
    sub = best[1]
    (fmt,) = struct.unpack_from(">H", data, sub)
    if fmt == 4:
        return _cmap_format4(data, sub)
    if fmt == 12:
        return _cmap_format12(data, sub)
    raise ValueError(f"unsupported cmap subtable format {fmt}")


def _cmap_format4(data: bytes, sub: int) -> dict[int, int]:
    (seg_x2,) = struct.unpack_from(">H", data, sub + 6)
    seg = seg_x2 // 2
    if seg == 0:
        raise ValueError("empty cmap format 4")
    end_at = sub + 14
    start_at = end_at + seg_x2 + 2  # +2: reservedPad
    delta_at = start_at + seg_x2
    range_at = delta_at + seg_x2
    out: dict[int, int] = {}
    for i in range(seg):
        end = struct.unpack_from(">H", data, end_at + 2 * i)[0]
        start = struct.unpack_from(">H", data, start_at + 2 * i)[0]
        delta = struct.unpack_from(">h", data, delta_at + 2 * i)[0]
        roff = struct.unpack_from(">H", data, range_at + 2 * i)[0]
        if start > end:
            raise ValueError("bad cmap format 4 segment")
        if start == 0xFFFF:  # the mandatory terminator segment
            continue
        for c in range(start, min(end, 0xFFFE) + 1):
            if roff == 0:
                gid = (c + delta) & 0xFFFF
            else:
                addr = range_at + 2 * i + roff + 2 * (c - start)
                if addr + 2 > len(data):
                    raise ValueError("cmap glyphIdArray out of bounds")
                gid = struct.unpack_from(">H", data, addr)[0]
                if gid:
                    gid = (gid + delta) & 0xFFFF
            if gid:
                out[c] = gid
    return out


def _cmap_format12(data: bytes, sub: int) -> dict[int, int]:
    (n_groups,) = struct.unpack_from(">I", data, sub + 12)
    if n_groups > 100_000:
        raise ValueError("implausible cmap format 12 group count")
    out: dict[int, int] = {}
    for i in range(n_groups):
        at = sub + 16 + 12 * i
        if at + 12 > len(data):
            raise ValueError("truncated cmap format 12 groups")
        start, end, gid0 = struct.unpack_from(">III", data, at)
        if start > end or end > 0x10FFFF:
            raise ValueError("bad cmap format 12 group")
        for j, c in enumerate(range(start, end + 1)):
            out[c] = gid0 + j
    return out


def gid_to_unicode(data: bytes) -> dict[int, str]:
    """Invert the font's unicode->gid map (lowest codepoint wins on
    double-mapped glyphs — the deterministic choice)."""
    inv: dict[int, str] = {}
    u2g = ttf_unicode_to_gid(data)
    for cp in sorted(u2g):
        gid = u2g[cp]
        if gid not in inv:
            inv[gid] = chr(cp)
    return inv


# -- fixture writer -----------------------------------------------------------


def _sfnt_wrap(tables: list[tuple[bytes, bytes]]) -> bytes:
    """Assemble an sfnt from (tag, body) pairs with a correct directory
    (checksums are naive u32 sums; parsers don't verify them)."""
    n = len(tables)
    entry_sel = max(0, n.bit_length() - 1)
    search = (1 << entry_sel) * 16
    head = struct.pack(">IHHHH", 0x00010000, n, search, entry_sel, n * 16 - search)
    off = 12 + 16 * n
    dirs = b""
    bodies = b""
    for tag, body in tables:
        padded = body + b"\x00" * (-len(body) % 4)
        csum = sum(
            struct.unpack_from(">I", padded, i)[0]
            for i in range(0, len(padded), 4)
        ) & 0xFFFFFFFF
        dirs += tag + struct.pack(">III", csum, off, len(body))
        bodies += padded
        off += len(padded)
    return head + dirs + bodies


def ttf_encode_cmap(mapping: dict[int, int], fmt: int = 4) -> bytes:
    """Fixture: a minimal font whose `cmap` (format 4 or 12) encodes
    the given {codepoint: glyph_id} mapping. Consecutive-codepoint /
    consecutive-gid runs become single segments/groups."""
    runs: list[list[tuple[int, int]]] = []
    for cp in sorted(mapping):
        gid = mapping[cp]
        if runs and cp == runs[-1][-1][0] + 1 and gid == runs[-1][-1][1] + 1:
            runs[-1].append((cp, gid))
        else:
            runs.append([(cp, gid)])
    if fmt == 12:
        groups = b"".join(
            struct.pack(">III", r[0][0], r[-1][0], r[0][1]) for r in runs
        )
        body = struct.pack(
            ">HHIII", 12, 0, 16 + len(groups), 0, len(runs)
        ) + groups
    elif fmt == 4:
        segs = [(r[0][0], r[-1][0], (r[0][1] - r[0][0]) & 0xFFFF) for r in runs]
        segs.append((0xFFFF, 0xFFFF, 1))  # mandatory terminator
        n = len(segs)
        entry_sel = max(0, n.bit_length() - 1)
        search = (1 << entry_sel) * 2
        sub_len = 16 + 8 * n
        body = struct.pack(
            ">HHHHHHH", 4, sub_len, 0, 2 * n, search, entry_sel, 2 * n - search
        )
        body += b"".join(struct.pack(">H", e) for _s, e, _d in segs)
        body += b"\x00\x00"  # reservedPad
        body += b"".join(struct.pack(">H", s) for s, _e, _d in segs)
        body += b"".join(struct.pack(">h", d - 0x10000 if d > 0x7FFF else d)
                         for _s, _e, d in segs)
        body += b"\x00\x00" * n  # idRangeOffset: all zero
    else:
        raise ValueError("fixture supports cmap formats 4 and 12")
    cmap = struct.pack(">HH", 0, 1) + struct.pack(">HHI", 3, 10 if fmt == 12 else 1, 12) + body
    return _sfnt_wrap([(b"cmap", cmap)])
