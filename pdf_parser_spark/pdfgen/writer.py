"""Minimal deterministic PDF writer (ISO 32000-1 subset).

Supports exactly the features the extraction kernel must handle:

- classic xref tables, cross-reference streams (/W [1 4 2] + PNG
  predictor optional), and object streams (/ObjStm)
- FlateDecode'd or raw content streams; /Contents as single stream or
  array of streams
- Type1/TrueType-ish font dicts with optional /ToUnicode CMap streams
  (bfchar and bfrange flavours, including >0xFF CID entries that the
  reference-compatible parser must skip), /Widths + /FirstChar
- multi-page documents and two-column layouts

Everything is byte-deterministic for a given input (no timestamps, no
randomness) so golden files are stable across runs.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field


class Raw(str):
    """A pre-serialized PDF fragment (names, refs) — emitted verbatim."""


def pdf_escape(line: str) -> str:
    """Escape a text line for embedding in a PDF literal string."""
    return line.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def serialize(obj) -> bytes:
    if isinstance(obj, Raw):
        return str(obj).encode("latin1")
    if obj is None:
        return b"null"
    if isinstance(obj, bool):
        return b"true" if obj else b"false"
    if isinstance(obj, int):
        return str(obj).encode()
    if isinstance(obj, float):
        s = f"{obj:.4f}".rstrip("0").rstrip(".")
        return s.encode()
    if isinstance(obj, str):  # treat bare str as a literal string object
        return b"(" + pdf_escape(obj).encode("latin1", "replace") + b")"
    if isinstance(obj, bytes):
        return b"(" + obj + b")"
    if isinstance(obj, list):
        return b"[" + b" ".join(serialize(x) for x in obj) + b"]"
    if isinstance(obj, dict):
        parts = [b"<<"]
        for k, v in obj.items():
            parts.append(f"/{k}".encode() + b" " + serialize(v))
        parts.append(b">>")
        return b" ".join(parts)
    raise TypeError(f"cannot serialize {type(obj)}")


@dataclass
class StreamObj:
    d: dict
    data: bytes
    compress: bool = True
    encoding: str | None = None  # overrides compress: 'lzw' | 'rl'
    no_encrypt: bool = False  # /EncryptMetadata false → plaintext XMP

    def body(self, encrypt_fn=None) -> bytes:
        if self.encoding == "lzw":
            from ..pdfcore.filters import lzw_encode

            payload = lzw_encode(self.data)
            filt = Raw("/LZWDecode")
        elif self.encoding == "rl":
            from ..pdfcore.filters import runlength_encode

            payload = runlength_encode(self.data)
            filt = Raw("/RunLengthDecode")
        elif self.compress:
            payload = zlib.compress(self.data, 6)
            filt = Raw("/FlateDecode")
        else:
            payload = self.data
            filt = None
        if encrypt_fn is not None:
            # encryption applies AFTER filter encoding (readers decrypt
            # first, then decode) — and /Length must describe the
            # ciphertext, which AES grows (IV prefix + block padding)
            payload = encrypt_fn(payload)
        d = dict(self.d)
        d["Length"] = len(payload)
        if filt is not None:
            d["Filter"] = filt
        return serialize(d) + b"\nstream\n" + payload + b"\nendstream"


@dataclass
class FontSpec:
    """Synthetic font resource description."""

    tounicode: str | None = None  # CMap string; None → no /ToUnicode
    encoding: str | dict | None = "WinAnsiEncoding"  # name, or custom dict
    first_char: int = 32
    widths: list[int] = field(default_factory=list)
    base_font: str = "Helvetica"

    def font_dict(self, tounicode_ref: Raw | None) -> dict:
        d: dict = {
            "Type": Raw("/Font"),
            "Subtype": Raw("/Type1"),
            "BaseFont": Raw(f"/{self.base_font}"),
        }
        if isinstance(self.encoding, dict):
            # custom encoding dictionary: {"BaseEncoding": name,
            # "Differences": [int, "GlyphName", ...]}
            enc: dict = {"Type": Raw("/Encoding")}
            if self.encoding.get("BaseEncoding"):
                enc["BaseEncoding"] = Raw(f"/{self.encoding['BaseEncoding']}")
            diffs = self.encoding.get("Differences")
            if diffs:
                enc["Differences"] = [
                    d_ if isinstance(d_, int) else Raw(f"/{d_}") for d_ in diffs
                ]
            d["Encoding"] = enc
        elif self.encoding:
            d["Encoding"] = Raw(f"/{self.encoding}")
        if self.widths:
            d["FirstChar"] = self.first_char
            d["LastChar"] = self.first_char + len(self.widths) - 1
            d["Widths"] = list(self.widths)
        if tounicode_ref is not None:
            d["ToUnicode"] = tounicode_ref
        return d


def _writer_encrypt_dict(enc: dict) -> dict:
    """crypt.build_encrypt_dict output → serializable writer dict
    (byte values as hex strings so ciphertext never needs escaping;
    V4/V5 crypt-filter fields pass through as names/dicts)."""
    d: dict = {
        "Filter": Raw("/Standard"),
        "V": enc["V"],
        "R": enc["R"],
        "O": Raw("<" + enc["O"].hex().upper() + ">"),
        "U": Raw("<" + enc["U"].hex().upper() + ">"),
        "P": enc["P"],
        "Length": enc["Length"],
    }
    for k in ("OE", "UE", "Perms"):
        if k in enc:
            d[k] = Raw("<" + enc[k].hex().upper() + ">")
    if enc.get("EncryptMetadata") is False:
        d["EncryptMetadata"] = False
    if "CF" in enc:
        cfm = enc["CF"]["StdCF"]["CFM"]
        d["CF"] = {
            "StdCF": {
                "CFM": Raw(f"/{cfm}"),
                "Length": enc["CF"]["StdCF"]["Length"],
            }
        }
        d["StmF"] = Raw("/StdCF")
        d["StrF"] = Raw("/StdCF")
    return d


def _encrypt_strings(obj, cryptor, num: int):
    """Deep-copy *obj* with every literal string RC4-encrypted and
    re-emitted in hex form. Bare ``bytes`` values are already-escaped
    fragments in this writer's model and never appear in the fixture
    object graphs, so only ``str`` values are transformed."""
    if isinstance(obj, Raw):
        return obj
    if isinstance(obj, str):
        ct = cryptor.encrypt(obj.encode("latin1", "replace"), num, 0)
        return Raw("<" + ct.hex().upper() + ">")
    if isinstance(obj, list):
        return [_encrypt_strings(x, cryptor, num) for x in obj]
    if isinstance(obj, dict):
        return {k: _encrypt_strings(v, cryptor, num) for k, v in obj.items()}
    return obj


def build_pdf(
    page_contents: list[list[bytes]],
    fonts: dict[str, FontSpec] | None = None,
    variant: str = "classic",
    compress: bool = True,
    use_objstm: bool = False,
    encrypted: bool = False,
    encrypt_revision: int = 3,
    encrypt_user_pw: bytes = b"",
    content_encoding: str | None = None,
    metadata: bytes | None = None,
    encrypt_metadata: bool = True,
) -> bytes:
    """Assemble a PDF.

    page_contents: one entry per page; each entry is a list of content
    stream byte strings (len>1 → /Contents array).
    variant: 'classic' (xref table) or 'xrefstream'.
    use_objstm: pack non-stream objects into an /ObjStm (requires
    variant='xrefstream').
    fonts={} (empty dict, not None) emits NO font resources — a
    "fontless" PDF whose text ops never decode, exercising the
    degraded fallback-sweep path.
    encrypted=True: RC4 standard-security encryption with EMPTY owner
    and user passwords (ISO 32000-1 §7.6.3; R2 → V1/40-bit,
    R3 → V2/128-bit) — streams and strings enciphered per object,
    /ID derived deterministically from the plaintext so output stays
    byte-reproducible. Cross-reference streams are left clear (§7.5.8.2)
    and ObjStm members ride on their container's encryption (§7.5.7).
    metadata: XMP bytes → a catalog-linked /Type /Metadata stream
    (stored uncompressed, per convention). encrypt_metadata=False
    (V4 only, §7.6.2 Algorithm 1 step b): the metadata stream is
    stored in PLAINTEXT and the key derivation hashes in ffffffff.
    """
    fonts = {"F1": FontSpec()} if fonts is None else fonts
    objects: dict[int, object] = {}
    next_num = 1

    def alloc() -> int:
        nonlocal next_num
        n = next_num
        next_num += 1
        return n

    catalog_num = alloc()
    pages_num = alloc()

    font_refs: dict[str, Raw] = {}
    for name, spec in fonts.items():
        tu_ref = None
        if spec.tounicode is not None:
            tu_num = alloc()
            objects[tu_num] = StreamObj(
                {}, spec.tounicode.encode("latin1"), compress=compress
            )
            tu_ref = Raw(f"{tu_num} 0 R")
        fd_num = alloc()
        objects[fd_num] = spec.font_dict(tu_ref)
        font_refs[name] = Raw(f"{fd_num} 0 R")

    resources = {"Font": {name: ref for name, ref in font_refs.items()}}

    page_nums = []
    for streams in page_contents:
        content_refs = []
        for data in streams:
            cn = alloc()
            objects[cn] = StreamObj(
                {}, data, compress=compress, encoding=content_encoding
            )
            content_refs.append(Raw(f"{cn} 0 R"))
        pn = alloc()
        objects[pn] = {
            "Type": Raw("/Page"),
            "Parent": Raw(f"{pages_num} 0 R"),
            "MediaBox": [0, 0, 612, 792],
            "Resources": resources,
            "Contents": content_refs[0] if len(content_refs) == 1 else content_refs,
        }
        page_nums.append(pn)

    objects[pages_num] = {
        "Type": Raw("/Pages"),
        "Kids": [Raw(f"{n} 0 R") for n in page_nums],
        "Count": len(page_nums),
    }
    objects[catalog_num] = {"Type": Raw("/Catalog"), "Pages": Raw(f"{pages_num} 0 R")}

    if metadata is not None:
        meta_num = alloc()
        objects[meta_num] = StreamObj(
            {"Type": Raw("/Metadata"), "Subtype": Raw("/XML")},
            metadata,
            compress=False,
            no_encrypt=encrypted and not encrypt_metadata,
        )
        objects[catalog_num]["Metadata"] = Raw(f"{meta_num} 0 R")

    crypt_ctx = None
    if encrypted:
        import hashlib

        from ..pdfcore.crypt import build_encrypt_dict

        id0 = hashlib.md5(
            b"".join(data for streams in page_contents for data in streams)
        ).digest()
        enc, cryptor = build_encrypt_dict(
            id0,
            revision=encrypt_revision,
            user_pw=encrypt_user_pw,
            encrypt_metadata=encrypt_metadata,
        )
        crypt_ctx = (_writer_encrypt_dict(enc), cryptor, id0)

    if variant == "classic":
        return _emit_classic(objects, catalog_num, crypt_ctx=crypt_ctx)
    if variant == "xrefstream":
        return _emit_xrefstream(
            objects, catalog_num, use_objstm=use_objstm, crypt_ctx=crypt_ctx
        )
    raise ValueError(f"unknown variant {variant}")


def _obj_bytes(num: int, obj, cryptor=None) -> bytes:
    if isinstance(obj, StreamObj):
        enc_fn = (
            (lambda p: cryptor.encrypt(p, num, 0))
            if cryptor is not None and not obj.no_encrypt
            else None
        )
        body = obj.body(enc_fn)
    else:
        if cryptor is not None:
            obj = _encrypt_strings(obj, cryptor, num)
        body = serialize(obj)
    return f"{num} 0 obj\n".encode() + body + b"\nendobj\n"


def _emit_classic(
    objects: dict[int, object], root: int, crypt_ctx=None
) -> bytes:
    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    cryptor = crypt_ctx[1] if crypt_ctx else None
    for num in sorted(objects):
        offsets[num] = len(out)
        out += _obj_bytes(num, objects[num], cryptor=cryptor)
    enc_num = None
    if crypt_ctx:
        enc_num = max(objects) + 1
        offsets[enc_num] = len(out)
        out += _obj_bytes(enc_num, crypt_ctx[0])  # never encrypted itself
    xref_pos = len(out)
    size = max(offsets) + 1
    out += f"xref\n0 {size}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, size):
        off = offsets.get(num, 0)
        out += f"{off:010d} 00000 n \n".encode()
    trailer = {"Size": size, "Root": Raw(f"{root} 0 R")}
    if crypt_ctx:
        idhex = Raw("<" + crypt_ctx[2].hex().upper() + ">")
        trailer["Encrypt"] = Raw(f"{enc_num} 0 R")
        trailer["ID"] = [idhex, idhex]
    out += b"trailer\n" + serialize(trailer)
    out += f"\nstartxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


def _emit_xrefstream(
    objects: dict[int, object],
    root: int,
    use_objstm: bool = False,
    crypt_ctx=None,
) -> bytes:
    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    entries: dict[int, tuple] = {}  # num -> (type, f2, f3)
    cryptor = crypt_ctx[1] if crypt_ctx else None

    objstm_members = []
    if use_objstm:
        objstm_members = [
            n for n, o in sorted(objects.items()) if not isinstance(o, StreamObj)
        ]
    direct = [n for n in sorted(objects) if n not in set(objstm_members)]

    for num in direct:
        entries[num] = ("file", len(out), 0)
        out += _obj_bytes(num, objects[num], cryptor=cryptor)

    objstm_num = None
    if objstm_members:
        objstm_num = max(objects) + 1
        header_parts = []
        body = bytearray()
        for num in objstm_members:
            header_parts.append(f"{num} {len(body)}")
            body += serialize(objects[num]) + b"\n"
        header = (" ".join(header_parts) + "\n").encode()
        stm = StreamObj(
            {
                "Type": Raw("/ObjStm"),
                "N": len(objstm_members),
                "First": len(header),
            },
            header + bytes(body),
            compress=True,
        )
        entries[objstm_num] = ("file", len(out), 0)
        # members are NOT individually encrypted — the container stream
        # is (§7.5.7), which _obj_bytes handles like any other stream
        out += _obj_bytes(objstm_num, stm, cryptor=cryptor)
        for idx, num in enumerate(objstm_members):
            entries[num] = ("objstm", objstm_num, idx)

    xref_num = (objstm_num or max(objects)) + 1
    xref_pos = len(out)
    size = xref_num + 1
    rows = bytearray()
    # entry 0: free
    rows += (0).to_bytes(1, "big") + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big")
    for num in range(1, size):
        if num == xref_num:
            kind = ("file", xref_pos, 0)
        else:
            kind = entries.get(num)
        if kind is None:
            rows += b"\x00" + (0).to_bytes(4, "big") + (0).to_bytes(2, "big")
        elif kind[0] == "file":
            rows += b"\x01" + int(kind[1]).to_bytes(4, "big") + int(kind[2]).to_bytes(2, "big")
        else:
            rows += b"\x02" + int(kind[1]).to_bytes(4, "big") + int(kind[2]).to_bytes(2, "big")
    xref_dict = {
        "Type": Raw("/XRef"),
        "Size": size,
        "W": [1, 4, 2],
        "Index": [0, size],
        "Root": Raw(f"{root} 0 R"),
    }
    if crypt_ctx:
        idhex = Raw("<" + crypt_ctx[2].hex().upper() + ">")
        xref_dict["Encrypt"] = crypt_ctx[0]  # inline dict; never encrypted
        xref_dict["ID"] = [idhex, idhex]
    xref_stream = StreamObj(xref_dict, bytes(rows), compress=True)
    # the cross-reference stream itself is never encrypted (§7.5.8.2)
    out += _obj_bytes(xref_num, xref_stream)
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


# --------------------------------------------------------------- corpus API


def make_text_pdf(
    pages_of_lines: list[list[str]],
    font: FontSpec | None = None,
    font_size: int = 12,
    variant: str = "classic",
    compress: bool = True,
    use_objstm: bool = False,
    contents_array: bool = False,
    two_column: bool = False,
    fontless: bool = False,
    encrypted: bool = False,
    encrypt_revision: int = 3,
) -> bytes:
    """One Tj per line, top-down from y=720, leading 14pt.

    two_column: lay half the lines at x=72 and half at x=320 but emit the
    right column FIRST in the content stream — pins content-stream-order
    (not reading-order) extraction, SURVEY.md §7.3.5.
    fontless: omit font resources entirely (degraded-path exercise).
    """
    fonts = {} if fontless else {"F1": font or FontSpec()}
    page_contents = []
    for lines in pages_of_lines:
        ops = [f"BT\n/F1 {font_size} Tf".encode("latin1")]
        if two_column:
            half = (len(lines) + 1) // 2
            cols = [(320, lines[half:]), (72, lines[:half])]
        else:
            cols = [(72, lines)]
        for x, col_lines in cols:
            y = 720
            for line in col_lines:
                esc = pdf_escape(line).encode("latin1", "replace")
                ops.append(f"1 0 0 1 {x} {y} Tm".encode() + b"\n(" + esc + b") Tj")
                y -= 14
        ops.append(b"ET")
        content = b"\n".join(ops)
        if contents_array:
            # each part ends with EOL so raw concatenation (the reference's
            # b''.join of /Contents array parts, api.py:78-80) stays token-safe
            mid = len(ops) // 2
            page_contents.append(
                [b"\n".join(ops[:mid]) + b"\n", b"\n".join(ops[mid:])]
            )
        else:
            page_contents.append([content])
    return build_pdf(
        page_contents,
        fonts=fonts,
        variant=variant,
        compress=compress,
        use_objstm=use_objstm,
        encrypted=encrypted,
        encrypt_revision=encrypt_revision,
    )


def _cid_escape(encoded: bytes) -> bytes:
    """Escape PDF string delimiters inside a 2-byte-encoded payload:
    only the BYTES 0x28/0x29/0x5C need a backslash, wherever they fall
    in the code units (for BMP ASCII they are always low bytes)."""
    out = bytearray()
    for b in encoded:
        if b in (0x28, 0x29, 0x5C):
            out.append(0x5C)
        out.append(b)
    return bytes(out)


def _array_form_bfranges(codes_to_chars: list[tuple[int, str]], width: int) -> str:
    """bfrange sections in the ARRAY-destination form real CJK
    ToUnicode streams use: consecutive code runs become
    ``<lo> <hi> [<d0> <d1> …]`` lines."""
    lines = []
    i = 0
    items = sorted(codes_to_chars)
    while i < len(items):
        j = i
        while j + 1 < len(items) and items[j + 1][0] == items[j][0] + 1:
            j += 1
        lo, hi = items[i][0], items[j][0]
        dsts = " ".join(f"<{ord(c):04X}>" for _, c in items[i : j + 1])
        lines.append(f"<{lo:0{width * 2}X}> <{hi:0{width * 2}X}> [{dsts}]")
        i = j + 1
    return f"{len(lines)} beginbfrange\n" + "\n".join(lines) + "\nendbfrange"


def make_cid_text_pdf(
    pages_of_lines: list[list[str]],
    font_size: int = 12,
    variant: str = "classic",
    compress: bool = True,
    array_form: bool = False,
    mixed: bool = False,
) -> bytes:
    """CID twin of make_text_pdf. Default shape: every character is
    encoded as TWO bytes (its UTF-16BE code unit) and the font carries
    an explicit <0000><FFFF> codespacerange ToUnicode CMap over the
    used characters. Only the kernel's multibyte CMap extension decodes
    it (single-byte parse yields '?' per byte — reference-identical).
    Same layout contract as make_text_pdf (one Tj per line, y from 720,
    leading 14).

    ``array_form=True`` emits the mapping as array-destination bfranges
    (``<lo> <hi> [<d0> …]`` — the form real CJK ToUnicode streams use).
    ``mixed=True`` emits an SJIS-like MIXED codespace: ASCII characters
    travel as identity 1-byte codes (<00> <7F>), everything else gets
    an allocated 2-byte code from <8040> upward (<8040> <FEFF>) — the
    decoder must use the declared codespaces to split codes."""
    used = sorted(
        {ch for lines in pages_of_lines for line in lines for ch in line}
    )
    if any(ord(c) > 0xFFFF for c in used):
        raise ValueError("make_cid_text_pdf supports BMP characters only")

    if mixed:
        narrow = [(ord(c), c) for c in used if ord(c) < 0x80]
        alloc = {
            c: 0x8040 + k
            for k, c in enumerate(c for c in used if ord(c) >= 0x80)
        }
        wide = sorted((code, c) for c, code in alloc.items())
        cmap_parts = [
            "2 begincodespacerange",
            "<00> <7F>",
            "<8040> <FEFF>",
            "endcodespacerange",
        ]
        if array_form:
            if narrow:
                cmap_parts.append(_array_form_bfranges(narrow, width=1))
            if wide:
                cmap_parts.append(_array_form_bfranges(wide, width=2))
        else:
            ent1 = "\n".join(f"<{k:02X}> <{ord(c):04X}>" for k, c in narrow)
            ent2 = "\n".join(f"<{k:04X}> <{ord(c):04X}>" for k, c in wide)
            cmap_parts.append(
                f"{len(narrow) + len(wide)} beginbfchar\n{ent1}\n{ent2}\nendbfchar"
            )
        cmap_src = "\n".join(cmap_parts)

        def enc_line(line: str) -> bytes:
            out = bytearray()
            for c in line:
                if ord(c) < 0x80:
                    out.append(ord(c))
                else:
                    out += alloc[c].to_bytes(2, "big")
            return bytes(out)

    else:
        pairs = [(ord(c), c) for c in used]
        if array_form:
            body = _array_form_bfranges(pairs, width=2)
        else:
            entries = "\n".join(f"<{ord(c):04X}> <{ord(c):04X}>" for c in used)
            body = f"{len(used)} beginbfchar\n{entries}\nendbfchar"
        cmap_src = (
            "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" + body
        )

        def enc_line(line: str) -> bytes:
            return b"".join(ord(c).to_bytes(2, "big") for c in line)

    page_contents = []
    for lines in pages_of_lines:
        ops = [f"BT\n/F1 {font_size} Tf".encode("latin1")]
        y = 720
        for line in lines:
            ops.append(
                f"1 0 0 1 72 {y} Tm".encode()
                + b"\n("
                + _cid_escape(enc_line(line))
                + b") Tj"
            )
            y -= 14
        ops.append(b"ET")
        page_contents.append([b"\n".join(ops)])
    return build_pdf(
        page_contents,
        fonts={"F1": FontSpec(tounicode=cmap_src)},
        variant=variant,
        compress=compress,
    )


def text_to_pdf(
    text: str,
    lines_per_page: int = 48,
    variant: str = "classic",
    compress: bool = True,
    use_objstm: bool = False,
) -> bytes:
    """Corpus transform: source text → deterministic PDF, one Tj per line."""
    lines = text.split("\n")
    pages = [
        lines[i : i + lines_per_page] for i in range(0, len(lines), lines_per_page)
    ] or [[""]]
    return make_text_pdf(
        pages, variant=variant, compress=compress, use_objstm=use_objstm
    )


def expected_text_from_source(text: str) -> str:
    """The text the kernel must extract from ``text_to_pdf(text)``.

    Byte-for-byte the reference pipeline's output on the same PDF: each
    line is latin1-encoded with '?' replacement, decoded through the
    synthesized WinAnsi CMap (printable ASCII maps to itself, everything
    else to '?'), stripped, and dropped if empty. SQL-expressible (used
    as the DuckDB oracle for the flagship query):

        regexp_replace(line, '[^ -~]', '?', 'g') → trim → skip '' → join
    """
    out = []
    for line in text.split("\n"):
        decoded = "".join(ch if " " <= ch <= "~" else "?" for ch in line)
        stripped = decoded.strip()
        if stripped:
            out.append(stripped)
    return "\n".join(out)


def expected_fallback_text_from_source(text: str) -> str:
    """The text the degraded literal-sweep path must extract from a
    *fontless* ``text_to_pdf(text)``-shaped PDF: latin1 round-trip
    (chars > U+00FF become '?'), strip, drop empty — no WinAnsi CMap
    filtering, so bytes 0x80-0xFF survive as themselves. SQL twin:

        regexp_replace(line, '[^\\x00-\\x{00ff}]', '?', 'g') → trim → join
    """
    out = []
    for line in text.split("\n"):
        degraded = "".join(ch if ord(ch) <= 0xFF else "?" for ch in line)
        stripped = degraded.strip()
        if stripped:
            out.append(stripped)
    return "\n".join(out)
