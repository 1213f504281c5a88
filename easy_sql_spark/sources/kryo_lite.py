"""Minimal Kryo 4 wire-format codec for Hudi delete-block payloads.

Hudi log DELETE_BLOCKs below content version 3 carry
``SerializationUtils.serialize(...)`` output — Kryo 4
``writeClassAndObject`` of ``HoodieKey[]`` (block v1) or
``DeleteRecord[]`` (block v2) with ``registrationRequired=false`` and
default reference tracking (hudi-common SerializationUtils; kryo-shaded
4.0.x, the same line Spark bundles).  This module decodes exactly that
stream shape in pure Python so MOR log parsing keeps running inside
executor tasks without a JVM round-trip, and encodes it for
spec-conformant fixtures.

Wire elements implemented (validated byte-for-byte against the real
kryo-shaded 4.0.3 in Spark's JVM — see tests/test_hudi_log.py):

* varint: unsigned LEB128 (Kryo ``writeVarInt(_, true)``); zigzag
  variants for IntSerializer/LongSerializer values;
* string: Kryo's hybrid encoding — ASCII mode (chars as bytes, last
  byte ``|0x80``, chosen for pure-ASCII lengths 2..63) or UTF8-length
  mode (first byte ``|0x80``, 6+7+... bit length of charCount+1 with 0
  = null and 1 = empty, then UTF-8 bytes of the UTF-16 units);
* class tags: varint 0 = null, 1 = NAME (then a varint nameId, plus the
  class-name string on first occurrence), else registrationId+2 for the
  ten built-in registrations (int, String, float, boolean, byte, char,
  short, long, double, void — wrappers share the primitive's id);
* references (``new Kryo()`` default MapReferenceResolver): tracked
  objects (everything but primitive wrappers) consume one varint —
  0 = null (only where the field may be null), 1 = first occurrence
  (object then assigned the next id in pre-order), n >= 2 = back
  reference to id n-2.  Wrapper values write no reference varint via
  ``writeObject`` and a bare 1/0 presence marker via
  ``writeObjectOrNull``;
* FieldSerializer layout: declared fields sorted ALPHABETICALLY;
  final-typed fields (String) inline as ``writeObjectOrNull``,
  non-final fields (HoodieKey, Comparable orderingVal) nest a full
  ``writeClassAndObject``.

Scope (loud beyond it): element classes ``*.HoodieKey`` /
``*.DeleteRecord``; orderingVal in {null, Integer, Long, Float, Double,
String, org.apache.avro.util.Utf8 (both the modern 4-field and the
pre-avro-1.10 3-field FieldSerializer layouts — see
:func:`_read_avro_utf8`)}.  Anything else (custom payload classes,
zero-length Utf8) raises :class:`KryoUnsupportedError` naming the
class.
"""

from __future__ import annotations

import struct

_REGISTERED = (
    "int", "java.lang.String", "float", "boolean", "byte",
    "char", "short", "long", "double", "void",
)


class KryoFormatError(ValueError):
    pass


class KryoUnsupportedError(NotImplementedError):
    pass


class KryoReader:
    def __init__(self, buf: bytes, pos: int = 0) -> None:
        self.buf = buf
        self.pos = pos
        self.names: dict[int, str] = {}
        self.refs: list = []

    # ---------------------------------------------------------- scalars
    def var_int(self) -> int:
        out = shift = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 63:
                raise KryoFormatError("varint too long")

    def zigzag_int(self) -> int:
        v = self.var_int()
        return (v >> 1) ^ -(v & 1)

    def var_long(self) -> int:
        """Kryo writeVarLong: at most 9 bytes — bytes 1-8 are LEB128
        (7 payload bits + continuation bit), the 9th byte carries bits
        56-63 RAW with no continuation semantics.  A plain LEB128 loop
        mis-reads any |value| >= 2^62 (zigzag sets bit 63, so the raw
        9th byte has its high bit set)."""
        out = shift = 0
        for _ in range(8):
            b = self.buf[self.pos]
            self.pos += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
        b = self.buf[self.pos]
        self.pos += 1
        return out | b << 56

    def zigzag_long(self) -> int:
        v = self.var_long()
        return (v >> 1) ^ -(v & 1)

    def fixed_double(self) -> float:
        v = struct.unpack_from(">d", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def fixed_float(self) -> float:
        v = struct.unpack_from(">f", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def read_string(self) -> str | None:
        b = self.buf[self.pos]
        if not b & 0x80:
            # ASCII mode: chars as bytes until one with the high bit set
            end = self.pos
            while not self.buf[end] & 0x80:
                end += 1
            s = self.buf[self.pos : end].decode("ascii") + chr(
                self.buf[end] & 0x7F
            )
            self.pos = end + 1
            return s
        # UTF8-length mode
        self.pos += 1
        n = b & 0x3F
        if b & 0x40:
            b2 = self.buf[self.pos]
            self.pos += 1
            n |= (b2 & 0x7F) << 6
            if b2 & 0x80:
                b3 = self.buf[self.pos]
                self.pos += 1
                n |= (b3 & 0x7F) << 13
                if b3 & 0x80:
                    raise KryoUnsupportedError("string longer than 2^20 chars")
        if n == 0:
            return None
        if n == 1:
            return ""
        n -= 1  # charCount (UTF-16 units)
        chars = []
        for _ in range(n):
            c = self.buf[self.pos]
            self.pos += 1
            if c < 0x80:
                chars.append(chr(c))
            elif (c & 0xE0) == 0xC0:
                c2 = self.buf[self.pos]
                self.pos += 1
                chars.append(chr(((c & 0x1F) << 6) | (c2 & 0x3F)))
            elif (c & 0xF0) == 0xE0:
                c2 = self.buf[self.pos]
                c3 = self.buf[self.pos + 1]
                self.pos += 2
                chars.append(
                    chr(((c & 0x0F) << 12) | ((c2 & 0x3F) << 6) | (c3 & 0x3F))
                )
            else:
                raise KryoUnsupportedError(
                    "unsupported utf8 unit in kryo string"
                )
        return "".join(chars)

    # ------------------------------------------------------ class tags
    def read_class(self) -> str | None:
        """Class name, or None for Kryo's NULL tag."""
        tag = self.var_int()
        if tag == 0:
            return None
        if tag == 1:  # NAME scheme (unregistered class)
            name_id = self.var_int()
            if name_id in self.names:
                return self.names[name_id]
            name = self.read_string()
            if name is None:
                raise KryoFormatError("null class name")
            self.names[name_id] = name
            return name
        idx = tag - 2
        if idx >= len(_REGISTERED):
            raise KryoUnsupportedError(
                f"kryo registration id {idx} (only the built-in "
                "primitive/String registrations are known)"
            )
        return _REGISTERED[idx]

    # ------------------------------------------------------- references
    def new_ref_slot(self) -> int:
        self.refs.append(None)
        return len(self.refs) - 1

    def read_tracked(self, read_body, may_be_null: bool):
        """One reference-tracked object: varint 0 = null (mayBeNull
        positions only), 1 = new (ids assigned in pre-order — the slot
        is reserved BEFORE the body is read), n >= 2 = back-reference."""
        v = self.var_int()
        if v == 0:
            if not may_be_null:
                raise KryoFormatError("unexpected null reference marker")
            return None
        if v == 1:
            slot = self.new_ref_slot()
            obj = read_body()
            self.refs[slot] = obj
            return obj
        ref_id = v - 2
        if ref_id >= len(self.refs):
            raise KryoFormatError(f"dangling kryo back-reference {ref_id}")
        return self.refs[ref_id]


def _read_hoodie_key(r: KryoReader) -> tuple[str | None, str | None]:
    """FieldSerializer body of HoodieKey: fields sorted alphabetically —
    partitionPath, recordKey — both final String, so each is one
    mayBeNull tracked-string read."""
    partition_path = r.read_tracked(r.read_string, may_be_null=True)
    record_key = r.read_tracked(r.read_string, may_be_null=True)
    return record_key, partition_path


def _read_avro_utf8(r: KryoReader) -> str:
    """FieldSerializer body of ``org.apache.avro.util.Utf8`` — the
    common non-wrapper orderingVal class on pre-v3 Hudi tables whose
    ordering field is an avro string.  Two layouts exist in the wild,
    by avro version (fields alphabetical, as FieldSerializer orders
    them):

    * modern (avro >= 1.10, AVRO-2663 hash cache): ``bytes`` (byte[],
      tracked), ``hash`` (int zigzag), ``length`` (int zigzag, BYTE
      length), ``string`` (cached String, writeObjectOrNull) —
      validated byte-for-byte against kryo-shaded 4.0.3 + Spark's
      bundled avro (tests/test_hudi_log.py);
    * legacy (avro <= 1.9): the same without ``hash``.

    Layout detection: the legacy layout's first int is ALWAYS the byte
    length, while a modern hash cache only rarely equals it — so
    first-int != nbytes selects modern outright (whose length field is
    then asserted).  On the AMBIGUOUS first == nbytes case (a modern
    Utf8 whose populated hash cache happens to equal the byte length
    fits both readings), both continuations are parsed speculatively
    and the unique one whose remaining fields validate (modern: length
    == nbytes; both: cached string, when present, decodes to the same
    text) wins; zero or two validating continuations raise a
    KryoFormatError NAMING the ambiguity instead of a confusing
    dangling-back-reference failure downstream (ADVICE r9).  Zero-
    length values are refused loudly (both layouts emit
    indistinguishable zero streams there).
    """
    def read_byte_array():
        n = r.var_int() - 1
        raw = r.buf[r.pos : r.pos + n]
        r.pos += n
        return raw

    raw = r.read_tracked(read_byte_array, may_be_null=True)
    if raw is None:
        raise KryoUnsupportedError("avro Utf8 with null bytes field")
    nbytes = len(raw)
    text = raw.decode("utf-8")
    if nbytes == 0:
        raise KryoUnsupportedError(
            "empty avro Utf8 orderingVal (zero-length streams are "
            "wire-ambiguous across avro versions)"
        )
    first = r.zigzag_int()
    if first != nbytes:
        # unambiguously modern: ``first`` was the hash cache
        if r.zigzag_int() != nbytes:
            raise KryoFormatError("avro Utf8 length/bytes mismatch")
        cached = r.read_tracked(r.read_string, may_be_null=True)
        if cached is not None and cached != text:
            raise KryoFormatError("avro Utf8 cached string/bytes mismatch")
        return text

    # ambiguous: first == nbytes fits both a legacy length and a modern
    # hash cache — speculatively parse each continuation with full
    # rollback (position AND reference table), keep the unique survivor
    def attempt(modern: bool) -> bool:
        pos0, nrefs0 = r.pos, len(r.refs)
        try:
            if modern and r.zigzag_int() != nbytes:
                raise KryoFormatError("length/bytes mismatch")
            cached = r.read_tracked(r.read_string, may_be_null=True)
            if cached is not None and cached != text:
                raise KryoFormatError("cached string/bytes mismatch")
            return True
        except (KryoFormatError, UnicodeDecodeError, IndexError):
            return False
        finally:
            r.pos = pos0
            del r.refs[nrefs0:]

    ok = [m for m in (False, True) if attempt(m)]
    if len(ok) != 1:
        raise KryoFormatError(
            "avro Utf8 layout ambiguity: first int equals the byte "
            f"length ({nbytes}) and "
            + ("both legacy and modern continuations validate"
               if ok else "neither continuation validates")
        )
    if ok[0]:  # modern: consume the asserted length field for real
        r.zigzag_int()
    cached = r.read_tracked(r.read_string, may_be_null=True)
    if cached is not None and cached != text:
        raise KryoFormatError("avro Utf8 cached string/bytes mismatch")
    return text


class AvroUtf8(str):
    """Fixture marker: serialize this orderingVal as
    ``org.apache.avro.util.Utf8``.  ``legacy=True`` selects the
    pre-avro-1.10 3-field layout (no hash cache)."""

    legacy: bool = False


def _read_ordering_val(r: KryoReader):
    """DeleteRecord.orderingVal: a non-final Comparable field —
    writeClassAndObject of whatever the writer held."""
    cls = r.read_class()
    if cls is None:
        return None
    if cls == "int":
        return r.zigzag_int()
    if cls == "long":
        return r.zigzag_long()
    if cls == "double":
        return r.fixed_double()
    if cls == "float":
        return r.fixed_float()
    if cls == "java.lang.String":
        return r.read_tracked(r.read_string, may_be_null=False)
    if cls == "org.apache.avro.util.Utf8":
        return r.read_tracked(lambda: _read_avro_utf8(r), may_be_null=False)
    raise KryoUnsupportedError(
        f"DeleteRecord orderingVal class {cls!r} (supported: null, "
        "Integer, Long, Float, Double, String, avro Utf8)"
    )


def read_delete_records(payload: bytes) -> list[tuple[str, str]]:
    """Kryo payload of a v1/v2 Hudi delete block →
    ``[(recordKey, partitionPath)]`` (partitionPath '' for null).

    v1 arrays hold HoodieKey, v2 arrays hold DeleteRecord (a HoodieKey
    plus an orderingVal that this reader validates and drops — our MOR
    merge, like OverwriteWithLatestAvroPayload, is commit/seq-ordered).
    """
    r = KryoReader(payload)
    cls = r.read_class()
    if cls is None:
        return []
    if not (cls.startswith("[L") and cls.endswith(";")):
        raise KryoUnsupportedError(
            f"kryo delete payload class {cls!r} is not an object array"
        )
    element = cls[2:-1]
    is_delete_record = element.endswith(".DeleteRecord")
    if not is_delete_record and not element.endswith(".HoodieKey"):
        raise KryoUnsupportedError(
            f"kryo delete payload element class {element!r}"
        )

    out: list[tuple[str, str]] = []

    def read_array():
        n = r.var_int() - 1
        for _ in range(n):
            ecls = r.read_class()
            if ecls is None:
                continue  # null element: no key to delete
            if is_delete_record:

                def body():
                    # fields sorted: hoodieKey (non-final -> nested
                    # writeClassAndObject), orderingVal
                    kcls = r.read_class()
                    if kcls is None:
                        rec = None
                    elif kcls.endswith(".HoodieKey"):
                        rec = r.read_tracked(
                            lambda: _read_hoodie_key(r), may_be_null=False
                        )
                    else:
                        raise KryoUnsupportedError(
                            f"DeleteRecord.hoodieKey class {kcls!r}"
                        )
                    _read_ordering_val(r)
                    return rec

                rec = r.read_tracked(body, may_be_null=False)
            else:
                rec = r.read_tracked(
                    lambda: _read_hoodie_key(r), may_be_null=False
                )
            if rec is not None and rec[0] is not None:
                out.append((rec[0], rec[1] or ""))
        return tuple(out)

    r.read_tracked(read_array, may_be_null=False)
    return out


# ------------------------------------------------------------------ encode
class KryoWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.names: dict[str, int] = {}
        self.next_ref = 0
        self.ref_ids: dict[int, int] = {}  # id(obj) -> ref id

    def var_int(self, v: int) -> None:
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                return

    def zigzag_int(self, v: int) -> None:
        self.var_int((v << 1) ^ (v >> 31))

    def var_long(self, v: int) -> None:
        """Kryo writeVarLong semantics: at most 9 bytes; after 8
        continuation bytes the 9th carries bits 56-63 RAW.  A plain
        LEB128 emit would produce a 10-byte stream for |value| >= 2^62
        that real Kryo cannot read."""
        v &= (1 << 64) - 1
        n = 0
        while n < 8 and v >> 7:
            self.out.append((v & 0x7F) | 0x80)
            v >>= 7
            n += 1
        self.out.append(v)  # ≤7 payload bits, or the raw 9th byte

    def zigzag_long(self, v: int) -> None:
        self.var_long((v << 1) ^ (v >> 63))

    def write_string(self, s: str | None) -> None:
        if s is None:
            self.out.append(0x80)
            return
        if not s:
            self.out.append(0x81)
            return
        if 1 < len(s) < 64 and all(ord(c) < 128 for c in s):
            enc = s.encode("ascii")
            self.out += enc[:-1]
            self.out.append(enc[-1] | 0x80)
            return
        n = len(s) + 1
        if n >> 6 == 0:
            self.out.append(n | 0x80)
        elif n >> 13 == 0:
            self.out.append((n & 0x3F) | 0x40 | 0x80)
            self.out.append(n >> 6)
        else:
            self.out.append((n & 0x3F) | 0x40 | 0x80)
            self.out.append((n >> 6 & 0x7F) | 0x80)
            self.out.append(n >> 13)
        for c in s:
            cp = ord(c)
            if cp < 0x80:
                self.out.append(cp)
            elif cp < 0x800:
                self.out.append(0xC0 | (cp >> 6))
                self.out.append(0x80 | (cp & 0x3F))
            else:
                self.out.append(0xE0 | (cp >> 12))
                self.out.append(0x80 | ((cp >> 6) & 0x3F))
                self.out.append(0x80 | (cp & 0x3F))

    def write_class(self, name: str) -> None:
        if name in _REGISTERED:
            self.var_int(_REGISTERED.index(name) + 2)
            return
        self.var_int(1)
        if name in self.names:
            self.var_int(self.names[name])
            return
        nid = len(self.names)
        self.names[name] = nid
        self.var_int(nid)
        self.write_string(name)

    def track_new(self) -> None:
        """Emit the NOT_NULL marker for a newly tracked object."""
        self.var_int(1)
        self.next_ref += 1

    def track_unique(self, write_body) -> None:
        """Tracked write of an object with no prior occurrence: NOT_NULL
        marker, id reserved, body written."""
        self.track_new()
        write_body()

    def track(self, obj, may_be_null: bool, write_body) -> None:
        """Reference-tracked write: identical objects (by identity)
        back-reference their first occurrence, matching
        MapReferenceResolver.  ``obj`` MUST outlive the writer (CPython
        reuses ids of freed temporaries — use :meth:`track_unique` for
        one-off values)."""
        if obj is None:
            if not may_be_null:
                raise KryoFormatError("null where not allowed")
            self.var_int(0)
            return
        key = id(obj)
        if key in self.ref_ids:
            self.var_int(self.ref_ids[key] + 2)
            return
        self.ref_ids[key] = self.next_ref
        self.track_new()
        write_body()


def write_delete_records(
    keys: list[tuple[str, str]],
    version: int = 1,
    ordering_vals: list | None = None,
    shared_partition_path: bool = False,
) -> bytes:
    """Kryo payload for a v1 (HoodieKey[]) or v2 (DeleteRecord[]) Hudi
    delete block — the stream hudi-common SerializationUtils produces.
    ``shared_partition_path=True`` serializes one shared partitionPath
    string instance (interned-constant writer shape) so the stream
    exercises back-references."""
    if version not in (1, 2):
        raise ValueError("kryo delete payloads are block versions 1-2")
    w = KryoWriter()
    pkg = "org.apache.hudi.common.model"
    element = f"{pkg}.DeleteRecord" if version == 2 else f"{pkg}.HoodieKey"
    w.write_class(f"[L{element};")
    w.track_new()  # the array object itself is tracked
    w.var_int(len(keys) + 1)
    shared = {}

    def write_hoodie_key(rk: str, pp: str) -> None:
        # fields alphabetical: partitionPath, recordKey
        if pp is None:
            w.var_int(0)
        elif shared_partition_path:
            token = shared.setdefault(pp, pp)
            w.track(token, True, lambda: w.write_string(token))
        else:
            w.track_unique(lambda: w.write_string(pp))
        if rk is None:
            w.var_int(0)
        else:
            w.track_unique(lambda: w.write_string(rk))

    for i, (rk, pp) in enumerate(keys):
        w.write_class(element)
        if version == 1:
            w.track_unique(lambda: write_hoodie_key(rk, pp))
        else:
            ov = ordering_vals[i] if ordering_vals else None

            def body():
                w.write_class(f"{pkg}.HoodieKey")
                w.track_unique(lambda: write_hoodie_key(rk, pp))
                if ov is None:
                    w.var_int(0)  # writeClassAndObject(null)
                elif isinstance(ov, bool):
                    raise KryoUnsupportedError("boolean orderingVal")
                elif isinstance(ov, AvroUtf8):
                    w.write_class("org.apache.avro.util.Utf8")

                    def utf8_body():
                        raw = str(ov).encode("utf-8")
                        # bytes field (byte[] is reference-tracked)
                        w.track_unique(
                            lambda: (w.var_int(len(raw) + 1),
                                     w.out.extend(raw))
                        )
                        if not ov.legacy:
                            w.zigzag_int(0)  # hash cache, fresh
                        w.zigzag_int(len(raw))  # BYTE length
                        w.var_int(0)  # cached string: null (fresh Utf8)

                    w.track_unique(utf8_body)
                elif isinstance(ov, int):
                    w.write_class("long")
                    w.zigzag_long(ov)
                elif isinstance(ov, float):
                    w.write_class("double")
                    w.out += struct.pack(">d", ov)
                elif isinstance(ov, str):
                    w.write_class("java.lang.String")
                    w.track_unique(lambda: w.write_string(ov))
                else:
                    raise KryoUnsupportedError(f"orderingVal {type(ov)}")

            w.track_unique(body)
    return bytes(w.out)
