"""Sixth scalar-function batch: relative date numbers, sub-second
truncation, UTF8 predicate variants, CIDR ranges, UUID codecs, type
introspection, CRC, Hilbert curves, text tokenization.

References (semantics only): src/Functions/{toRelativeYearNum and family
via DateTimeTransforms.h, toStartOfInterval.cpp, UTF8 string families,
FunctionsCodingIP.cpp CIDR, FunctionsCodingUUID.cpp, bar.cpp, CRC.cpp,
hilbertEncode.cpp, substringIndex.cpp, tokens.cpp}.
"""
from __future__ import annotations

import re as _re
import uuid as _uuid
import zlib as _zlib

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dtypes as dt
from ..core.errors import TypeError_
from .expr import ColVal
from .functions import (FUNCTIONS, _and_validity as _andv, _as_days,
                        _civil_from_days, _days_from_civil, _string_fn_lut,
                        register)
from .functions_ext import _eager_rowfn, _resolve_str_array, \
    _string_to_array_lut


def _num(out_t):
    def resolve(ts):
        return out_t.with_nullable(any(t.nullable for t in ts))
    return resolve


# -------------------------------------------------- relative date numbers

def _relative(name, fn, out_t=dt.UInt32):
    def ex(args, out_dtype):
        a = args[0]
        secs = a.data.astype(jnp.int64)
        if a.dtype.name == "Date":
            secs = secs * 86400
        days = jnp.floor_divide(secs, 86400)
        y, m, d = _civil_from_days(days)
        v = fn(secs, days, y, m, d)
        return ColVal(out_dtype, v.astype(out_t.np_dtype.name),
                      _andv(args))
    register(name, _num(out_t), ex)


_relative("toRelativeYearNum", lambda s, dd, y, m, d: y, dt.UInt16)
_relative("toRelativeQuarterNum",
          lambda s, dd, y, m, d: y * 4 + (m - 1) // 3)
_relative("toRelativeMonthNum", lambda s, dd, y, m, d: y * 12 + m)
_relative("toRelativeWeekNum",
          lambda s, dd, y, m, d: jnp.floor_divide(dd + 4, 7))
_relative("toRelativeDayNum", lambda s, dd, y, m, d: dd)
_relative("toRelativeHourNum",
          lambda s, dd, y, m, d: jnp.floor_divide(s, 3600))
_relative("toRelativeMinuteNum",
          lambda s, dd, y, m, d: jnp.floor_divide(s, 60))
_relative("toRelativeSecondNum", lambda s, dd, y, m, d: s)


def _identity_datetime(name):
    # DateTime storage is whole seconds: sub-second truncation = identity
    register(name, lambda ts: ts[0],
             lambda args, t: ColVal(t, args[0].data, _andv(args)))


for _n in ("toStartOfMillisecond", "toStartOfMicrosecond",
           "toStartOfNanosecond"):
    _identity_datetime(_n)

for _n, _mult in (("toMillisecond", 0), ("toMicrosecond", 0),
                  ("toNanosecond", 0)):
    register(_n, _num(dt.UInt16),
             lambda args, t: ColVal(
                 t, jnp.zeros_like(args[0].data).astype(jnp.uint16),
                 _andv(args)))     # whole-second storage: fraction is 0

register("UTCTimestamp", FUNCTIONS["now"]._resolve,
         FUNCTIONS["now"]._execute)
register("nowInBlock", FUNCTIONS["now"]._resolve,
         FUNCTIONS["now"]._execute)
register("serverTimezone", FUNCTIONS["timezone"]._resolve,
         FUNCTIONS["timezone"]._execute)
register("timezoneOffset", _num(dt.Int32),
         lambda args, t: ColVal(
             t, jnp.zeros_like(args[0].data).astype(jnp.int32),
             _andv(args)))         # engine clock is UTC


def _exec_last_day_of_week(args, out_dtype):
    days = _as_days(args[0])
    dow = jnp.mod(days + 3, 7)              # Monday = 0
    return ColVal(out_dtype, (days + (6 - dow)).astype(jnp.int32),
                  _andv(args))


register("toLastDayOfWeek", lambda ts: dt.Date.with_nullable(
    ts[0].nullable), _exec_last_day_of_week)

_YEAR_ZERO_OFFSET = 719528          # days from 0000-01-01 to 1970-01-01

register("toDaysSinceYearZero", _num(dt.UInt32),
         lambda args, t: ColVal(
             t, (_as_days(args[0]) + _YEAR_ZERO_OFFSET).astype(jnp.uint32),
             _andv(args)))
register("fromDaysSinceYearZero",
         lambda ts: dt.Date.with_nullable(ts[0].nullable),
         lambda args, t: ColVal(
             t, (args[0].data.astype(jnp.int64)
                 - _YEAR_ZERO_OFFSET).astype(jnp.int32), _andv(args)))


# --------------------------------------------------------------- rounding

def _exec_round_down(args, out_dtype):
    """roundDown(x, [b1, b2, ...]): greatest boundary <= x (first boundary
    when below all)."""
    x = args[0].data.astype(jnp.float64)
    from .functions import _array_arg
    b = _array_arg(args[1])
    bd = b.data[0] if b.data.ndim == 2 else b.data
    bd = bd.astype(jnp.float64)
    out = jnp.full_like(x, bd[0])
    for i in range(bd.shape[0]):
        out = jnp.where(x >= bd[i], bd[i], out)
    return ColVal(out_dtype, out, _andv(args))


register("roundDown", _num(dt.Float64), _exec_round_down)


# ---------------------------------------------------------- UTF8 variants

for _n, _base in (("startsWithUTF8", "startsWith"),
                  ("endsWithUTF8", "endsWith")):
    register(_n, FUNCTIONS[_base]._resolve, FUNCTIONS[_base]._execute)

register("isASCII", lambda ts: dt.UInt8.with_nullable(ts[0].nullable),
         _string_fn_lut(lambda s: 1 if s.isascii() else 0, np.uint8,
                        vec_fn=lambda sv: np.char.encode(
                            sv, "ascii", "replace") ==
                        np.char.encode(sv, "utf-8", "replace")))


def _substring_index(s, delim, count):
    c = int(count)
    parts = str(s).split(str(delim))
    if c > 0:
        return str(delim).join(parts[:c])
    if c < 0:
        return str(delim).join(parts[c:])
    return ""


register("substringIndex", lambda ts: dt.String.with_nullable(
    any(t.nullable for t in ts)),
    _eager_rowfn(_substring_index, result="str"))
register("SUBSTRING_INDEX", lambda ts: dt.String.with_nullable(
    any(t.nullable for t in ts)),
    _eager_rowfn(_substring_index, result="str"))

register("firstLine", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _string_fn_lut(lambda s: s.splitlines()[0] if s else "", object))

register("tokens", _resolve_str_array,
         _string_to_array_lut(lambda s: _re.findall(r"[A-Za-z0-9_]+", s)))


def _ngrams_exec(args, out_dtype):
    from .functions_ext import _const_int
    n = _const_int(args[1])
    if n is None:
        raise TypeError_("ngrams: n must be a constant")
    return _string_to_array_lut(
        lambda s: [s[i:i + n] for i in range(max(len(s) - n + 1, 0))]
    )([args[0]], out_dtype)


register("ngrams", lambda ts: _resolve_str_array(ts[:1]), _ngrams_exec)


# ------------------------------------------------------------------- IPs

def _exec_ipv4_cidr(args, out_dtype):
    ip = args[0].data.astype(jnp.uint32)
    bits = args[1].data.astype(jnp.uint32)
    mask = jnp.where(bits >= 32, jnp.uint32(0xFFFFFFFF),
                     ~((jnp.uint32(1) << (32 - bits)) - 1))
    lo = ip & mask
    hi = lo | ~mask
    return ColVal(out_dtype, jnp.zeros(ip.shape, jnp.int8), _andv(args),
                  sub=[ColVal(dt.IPv4, lo.astype(jnp.uint32), None),
                       ColVal(dt.IPv4, hi.astype(jnp.uint32), None)])


register("IPv4CIDRToRange",
         lambda ts: dt.Tuple([dt.IPv4, dt.IPv4]), _exec_ipv4_cidr)


def _ipv6_cidr(ip_s, bits):
    import ipaddress
    try:
        net = ipaddress.IPv6Network(f"{ip_s}/{int(bits)}", strict=False)
        return f"('{net[0]}','{net[-1]}')"
    except ValueError:
        return "('::','::')"


register("IPv6CIDRToRange", lambda ts: dt.String.with_nullable(
    any(t.nullable for t in ts)),
    _eager_rowfn(_ipv6_cidr, result="str"))


def _ipv4_to_ipv6(v):
    x = int(v)
    return f"::ffff:{(x >> 24) & 255}.{(x >> 16) & 255}." \
           f"{(x >> 8) & 255}.{x & 255}"


register("IPv4ToIPv6", lambda ts: dt.String.with_nullable(ts[0].nullable),
         _eager_rowfn(_ipv4_to_ipv6, result="str"))


# ------------------------------------------------------------------ UUIDs

def _uuid_str_to_num(s):
    try:
        return _uuid.UUID(str(s)).bytes.decode("latin1")
    except ValueError:
        return "\x00" * 16


def _uuid_num_to_str(b):
    raw = str(b).encode("latin1")[:16].ljust(16, b"\0")
    return str(_uuid.UUID(bytes=raw))


register("UUIDStringToNum", lambda ts: dt.FixedString(16).with_nullable(
    ts[0].nullable), _eager_rowfn(_uuid_str_to_num, result="str"))
register("UUIDNumToString", lambda ts: dt.String.with_nullable(
    ts[0].nullable), _eager_rowfn(_uuid_num_to_str, result="str"))

for _n in ("toUUIDOrZero", "toUUIDOrNull"):
    def _mk_uuid(null: bool):
        def ex(args, out_dtype):
            base = FUNCTIONS["toUUID"]
            try:
                return base._execute(args, out_dtype)
            except Exception:        # noqa: BLE001 — per contract
                z = jnp.zeros_like(args[0].data)
                val = jnp.zeros(getattr(args[0].data, "shape", ()),
                                jnp.uint8) if null else None
                return ColVal(out_dtype, z, val)
        return ex
    if "toUUID" in FUNCTIONS:
        register(_n, lambda ts, _null=("Null" in _n): (
            dt.make_nullable(dt.UUID) if _null else dt.UUID),
            _mk_uuid("Null" in _n))


# ------------------------------------------------------ type introspection

register("isNullable", lambda ts: dt.UInt8,
         lambda args, t: ColVal(
             t, jnp.asarray(1 if args[0].dtype.nullable else 0,
                            jnp.uint8), None))


def _default_of_type(tn):
    t0 = dt.parse_type_name(str(tn))
    if t0.is_dictionary:
        return ""
    return 0


register("defaultValueOfTypeName",
         lambda ts: dt.Int64,
         _eager_rowfn(_default_of_type, result="num"))


# ------------------------------------------------------------------ misc

def _exec_bar(args, out_dtype):
    def host(x, lo, hi, width=80):
        x, lo, hi, width = float(x or 0), float(lo), float(hi), float(width)
        frac = 0.0 if hi <= lo else max(min((x - lo) / (hi - lo), 1.0), 0.0)
        units = frac * width
        full = int(units)
        rem = units - full
        bar = "█" * full
        if rem > 0:
            eighths = int(rem * 8)
            if eighths:
                bar += chr(0x2590 - eighths)
        return bar
    return _eager_rowfn(host, result="str")(args, out_dtype)


register("bar", lambda ts: dt.String, _exec_bar)

register("blockNumber", lambda ts: dt.UInt64,
         lambda args, t: ColVal(t, jnp.asarray(1, jnp.uint64), None))

register("CRC32", _num(dt.UInt32),
         _string_fn_lut(lambda s: _zlib.crc32(s.encode()) & 0xFFFFFFFF,
                        np.uint32))
register("CRC32IEEE", _num(dt.UInt32),
         _string_fn_lut(lambda s: _zlib.crc32(s.encode()) & 0xFFFFFFFF,
                        np.uint32))
register("CRC64", _num(dt.UInt64),
         _string_fn_lut(lambda s: _crc64_ecma(s.encode()), np.uint64))


def _crc64_ecma(data: bytes) -> int:
    """CRC-64/XZ (ECMA polynomial, reflected) — the reference's CRC64."""
    poly = 0xC96C5795D7870F42
    crc = 0xFFFFFFFFFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
    return crc ^ 0xFFFFFFFFFFFFFFFF


# ----------------------------------------------------------- space curves

def _exec_hilbert_encode(args, out_dtype):
    """hilbertEncode(x, y) -> d (2-D Hilbert curve, 32-bit coords)."""
    def host(x, y, order=32):
        rx = ry = 0
        d = 0
        x, y = int(x), int(y)
        s = 1 << (order - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            # rotate
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s >>= 1
        return d
    return _eager_rowfn(host, result="num")(args, out_dtype)


register("hilbertEncode", _num(dt.UInt64), _exec_hilbert_encode)


def _hilbert_decode(d, order=32):
    x = y = 0
    t = int(d)
    s = 1
    while s < (1 << order):
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s <<= 1
    return x, y


def _exec_hilbert_decode(args, out_dtype):
    import jax as _jx
    vals = np.asarray(_jx.device_get(args[0].data)).reshape(-1)
    pts = [_hilbert_decode(v) for v in vals]
    xs = jnp.asarray(np.asarray([p[0] for p in pts], np.uint64))
    ys = jnp.asarray(np.asarray([p[1] for p in pts], np.uint64))
    if getattr(args[0].data, "ndim", 0) == 0:
        xs, ys = xs[0], ys[0]
    return ColVal(out_dtype, jnp.zeros(getattr(args[0].data, "shape", ()),
                                       jnp.int8), _andv(args),
                  sub=[ColVal(dt.UInt64, xs, None),
                       ColVal(dt.UInt64, ys, None)])


def _exec_hilbert_decode_guard(args, out_dtype):
    if isinstance(args[0].data, jax.core.Tracer):
        from ..core.errors import RequiresMaterialization
        raise RequiresMaterialization("hilbertDecode needs concrete values")
    return _exec_hilbert_decode(args, out_dtype)


register("hilbertDecode", lambda ts: dt.Tuple([dt.UInt64, dt.UInt64]),
         _exec_hilbert_decode_guard)


def _exec_morton_decode(args, out_dtype):
    def host_xy(d):
        d = int(d)
        x = y = 0
        for i in range(32):
            x |= ((d >> (2 * i)) & 1) << i
            y |= ((d >> (2 * i + 1)) & 1) << i
        return x, y
    if isinstance(args[0].data, jax.core.Tracer):
        from ..core.errors import RequiresMaterialization
        raise RequiresMaterialization("mortonDecode needs concrete values")
    vals = np.asarray(jax.device_get(args[0].data)).reshape(-1)
    pts = [host_xy(v) for v in vals]
    xs = jnp.asarray(np.asarray([p[0] for p in pts], np.uint64))
    ys = jnp.asarray(np.asarray([p[1] for p in pts], np.uint64))
    if getattr(args[0].data, "ndim", 0) == 0:
        xs, ys = xs[0], ys[0]
    return ColVal(out_dtype, jnp.zeros(getattr(args[0].data, "shape", ()),
                                       jnp.int8), _andv(args),
                  sub=[ColVal(dt.UInt64, xs, None),
                       ColVal(dt.UInt64, ys, None)])


register("mortonDecode", lambda ts: dt.Tuple([dt.UInt64, dt.UInt64]),
         _exec_morton_decode)


# ------------------------------------------------ conversion spellings
# OrZero/OrNull wrappers around existing strict converters (ref:
# FunctionsConversion.h accurateCastOrNull family): the strict exec runs;
# a parse failure yields 0 / NULL instead of an error.

_DATEISH = _re.compile(r"^\s*\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2})?")


def _or_wrap(base_name, null: bool, zero_dtype):
    base = FUNCTIONS[base_name]

    def ex(args, out_dtype):
        a = args[0]
        try:
            out = base._execute(args, dt.remove_nullable(out_dtype))
        except Exception:            # noqa: BLE001 — per OrZero contract
            shape = getattr(a.data, "shape", ())
            z = jnp.zeros(shape, zero_dtype.np_dtype.name)
            v = jnp.zeros(shape, jnp.uint8) if null else None
            return ColVal(out_dtype, z, v)
        if a.dtype.is_dictionary and a.dictionary is not None:
            # per-unique parseability LUT: unparseable rows -> 0 / NULL
            ok_lut = jnp.asarray(np.asarray(
                [1 if _DATEISH.match(str(v)) else 0
                 for v in a.dictionary.values] or [0], np.uint8))
            ok = ok_lut[jnp.maximum(a.data, 0)]
            data = jnp.where(ok > 0, out.data,
                             jnp.zeros((), out.data.dtype))
            v = ok if null else None
            if null and out.validity is not None:
                v = v * out.validity
            return ColVal(out_dtype, data, v, out.dictionary
                          if out.dtype.is_dictionary else None,
                          lengths=out.lengths)
        if null and out.validity is None:
            return ColVal(out_dtype, out.data,
                          jnp.ones(getattr(out.data, "shape", ()),
                                   jnp.uint8), out.dictionary,
                          lengths=out.lengths)
        return out
    return ex


for _b, _t in (("toDate", dt.Date), ("toDate32", dt.parse_type_name(
        "Date32")), ("toDateTime", dt.DateTime)):
    if _b in FUNCTIONS:
        register(_b + "OrZero", lambda ts, _t=_t: _t,
                 _or_wrap(_b, False, _t))
        register(_b + "OrNull", lambda ts, _t=_t: dt.make_nullable(_t),
                 _or_wrap(_b, True, _t))

register("toDateTime64",
         lambda ts: dt.DateTime64(3),
         lambda args, t: ColVal(t, (
             args[0].data.astype(jnp.float64) * 1000).astype(jnp.int64),
             _andv(args[:1])))


def _typed_decimal(name, prec):
    def resolve(ts):
        return dt.Decimal(prec, 0)       # refined by the literal scale at
                                         # bind (literal_typed_target)
    def ex(args, out_dtype):
        return FUNCTIONS["_cast"]._execute([args[0]], out_dtype)
    register(name, resolve, ex)


# toDecimal32(x, S) spellings resolve through literal_typed_target at bind
# time; the registry entries make the names first-class (DESCRIBE/describe
# of system.functions) and serve the no-scale form
for _n, _p in (("toDecimal32", 9), ("toDecimal64", 18),
               ("toDecimal128", 38), ("toDecimal256", 76)):
    _typed_decimal(_n, _p)


register("emptyArrayDateTime", lambda ts: dt.Array(dt.DateTime),
         lambda args, t: ColVal(t, jnp.zeros((8,), jnp.int64), None,
                                lengths=jnp.asarray(0, jnp.int32)))


def _exec_array_flatten(args, out_dtype):
    # single-level device arrays: flatten of a flat array is the array
    # itself; genuinely nested arrays are not storage columns here
    return args[0]


register("arrayFlatten", lambda ts: ts[0], _exec_array_flatten)

register("leftUTF8", FUNCTIONS["left"]._resolve, FUNCTIONS["left"]._execute)
register("rightUTF8", FUNCTIONS["right"]._resolve,
         FUNCTIONS["right"]._execute)
register("canonicalRand", FUNCTIONS["randCanonical"]._resolve,
         FUNCTIONS["randCanonical"]._execute)
register("parseDateTime32BestEffort",
         FUNCTIONS["parseDateTimeBestEffort"]._resolve,
         FUNCTIONS["parseDateTimeBestEffort"]._execute)


_CH_STRPTIME = (("%Y", "%Y"), ("%y", "%y"), ("%m", "%m"), ("%c", "%m"),
                ("%d", "%d"), ("%e", "%d"), ("%H", "%H"), ("%k", "%H"),
                ("%i", "%M"), ("%s", "%S"), ("%S", "%S"), ("%f", "%f"),
                ("%p", "%p"), ("%j", "%j"), ("%a", "%a"), ("%b", "%b"),
                ("%M", "%B"), ("%W", "%A"), ("%D", "%m/%d/%y"),
                ("%T", "%H:%M:%S"), ("%F", "%Y-%m-%d"))


def _parse_datetime(s, fmt, *tz):
    import calendar
    import datetime as dtime
    table = dict(_CH_STRPTIME)
    # single pass so '%i' -> '%M' is never re-rewritten by '%M' -> '%B'
    pyfmt = _re.sub("%.", lambda m: table.get(m.group(0), m.group(0)),
                    str(fmt))
    t = dtime.datetime.strptime(str(s), pyfmt)
    return calendar.timegm(t.timetuple())


register("parseDateTime", lambda ts: dt.DateTime,
         _eager_rowfn(_parse_datetime, result="num"))
register("parseDateTimeInJodaSyntax", lambda ts: dt.DateTime,
         _eager_rowfn(lambda s, fmt, *tz: _parse_datetime(
             s, str(fmt).replace("yyyy", "%Y").replace("MM", "%m")
             .replace("dd", "%d").replace("HH", "%H").replace("mm", "%i")
             .replace("ss", "%s"), *tz), result="num"))


def _exec_multi_search(kind):
    def ex(args, out_dtype):
        from .functions import _array_arg
        hay = args[0]
        needles_cv = args[1]
        nd = _array_arg(needles_cv)
        if nd.dictionary is None:
            raise TypeError_("multiSearch*: needles must be strings")
        ndata = nd.data[0] if nd.data.ndim == 2 else nd.data
        import jax as _jx
        if isinstance(ndata, jax.core.Tracer):
            from ..core.errors import RequiresMaterialization
            raise RequiresMaterialization(
                "multiSearch* needles need concrete values")
        codes = np.asarray(_jx.device_get(ndata)).reshape(-1)
        nlen = int(np.asarray(_jx.device_get(
            nd.lengths)).reshape(-1)[0]) if nd.lengths is not None \
            else len(codes)
        needles = [str(nd.dictionary.values[c])
                   for c in codes[:nlen]]

        if kind == "first_index":
            def host(s):
                for i, n in enumerate(needles):
                    if n in s:
                        return i + 1
                return 0
            return _string_fn_lut(host, np.uint64)([hay], out_dtype)
        if kind == "first_position":
            def host(s):
                best = 0
                for n in needles:
                    p = s.find(n) + 1
                    if p and (best == 0 or p < best):
                        best = p
                return best
            return _string_fn_lut(host, np.uint64)([hay], out_dtype)
        # all_positions -> Array(UInt64)
        def hostl(s):
            return [str(s.find(n) + 1) for n in needles]
        lut = _string_to_array_lut(hostl)([hay], dt.Array(dt.String))
        # positions came through a string LUT; convert codes -> ints
        vals = lut.dictionary.values.astype(str).astype(np.int64) \
            if lut.dictionary is not None and len(lut.dictionary) \
            else np.zeros(1, np.int64)
        table = jnp.asarray(vals.astype(np.uint64))
        data = table[jnp.maximum(lut.data, 0)]
        return ColVal(out_dtype, data, lut.validity, lengths=lut.lengths)
    return ex


register("multiSearchFirstIndex", lambda ts: dt.UInt64.with_nullable(
    ts[0].nullable), _exec_multi_search("first_index"))
register("multiSearchAllPositions", lambda ts: dt.Array(dt.UInt64),
         _exec_multi_search("all_positions"))


def _extract_groups(horizontal):
    def ex(args, out_dtype):
        pat_cv = args[1]
        if pat_cv.dictionary is None or len(pat_cv.dictionary) != 1:
            raise TypeError_("extractAllGroups: constant pattern required")
        rx = _re.compile(str(pat_cv.dictionary.values[0]))

        def host(s):
            ms = rx.findall(s)
            rows = [list(m) if isinstance(m, tuple) else [m] for m in ms]
            if not rows:
                return []
            if horizontal:
                cols = list(map(list, zip(*rows)))
                return [x for col in cols for x in col]
            return [x for r in rows for x in r]
        return _string_to_array_lut(host)([args[0]], out_dtype)
    return ex


register("extractAllGroupsHorizontal", lambda ts: _resolve_str_array(ts),
         _extract_groups(True))
register("extractAllGroupsVertical", lambda ts: _resolve_str_array(ts),
         _extract_groups(False))
register("extractAllGroups", lambda ts: _resolve_str_array(ts),
         _extract_groups(False))


def _exec_has_column_in_table(args, out_dtype):
    from ..exec.session import active_session
    s = active_session()

    def host(*parts):
        parts = [str(p) for p in parts]
        if len(parts) == 2:
            db, tbl, col = s.catalog.current_database, parts[0], parts[1]
        else:
            db, tbl, col = parts[-3], parts[-2], parts[-1]
        try:
            t = s.catalog.get_table(db, tbl)
        except Exception:            # noqa: BLE001
            return 0
        if col in t.schema:
            return 1
        # ALIAS/EPHEMERAL columns live in column_defaults, not the
        # physical schema
        return 1 if col in (getattr(t, "column_defaults", None) or {}) \
            else 0
    return _eager_rowfn(host, result="num")(args, out_dtype)


register("hasColumnInTable", lambda ts: dt.UInt8,
         _exec_has_column_in_table)


def _session_list(getter):
    def ex(args, out_dtype):
        from ..exec.session import active_session
        s = active_session()
        vals = getter(s) if s is not None else []
        lists = [[str(v) for v in vals]]
        from .functions_ext import _string_to_array_lut as _lut
        # constant result: encode through a single-value dictionary column
        const = ColVal(dt.String, jnp.asarray(0, jnp.int32), None,
                       None)
        return _lut(lambda _s: lists[0])([ColVal(
            dt.String, jnp.asarray(0, jnp.int32), None,
            __import__("clickhouse_tpu.core.column",
                       fromlist=["Dictionary"]).Dictionary(
                           np.asarray([""], object)))], out_dtype)
    register_name = None
    return ex


register("currentRoles", lambda ts: dt.Array(dt.String),
         _session_list(lambda s: s.catalog.access.roles_of(
             getattr(s.current_user, "name", "default"))
             if hasattr(s.catalog.access, "roles_of") else []))
register("currentProfiles", lambda ts: dt.Array(dt.String),
         _session_list(lambda s: ["default"]))
register("defaultRoles", lambda ts: dt.Array(dt.String),
         _session_list(lambda s: []))


def _exec_get_setting(args, out_dtype):
    from ..exec.session import active_session
    s = active_session()

    def host(name):
        # non-constant names: numeric view only (constant names fold at
        # bind time with the real type — plan/analyzer.py _bind_call)
        d = s.settings.as_dict() if s is not None else {}
        if str(name) not in d:
            raise TypeError_(f"Unknown setting '{name}'")
        v = d[str(name)]
        return float(v) if isinstance(v, (int, float, bool)) else 0.0
    return _eager_rowfn(host, result="num")(args, out_dtype)


register("getSetting", lambda ts: dt.Float64, _exec_get_setting)


def _exec_get_macro(args, out_dtype):
    from ..exec.session import active_session
    s = active_session()

    def host(name):
        macros = getattr(s, "macros", {}) if s is not None else {}
        if str(name) not in macros:
            raise TypeError_(f"No macro '{name}' in config")
        return str(macros[str(name)])
    return _eager_rowfn(host, result="str")(args, out_dtype)


register("getMacro", lambda ts: dt.String, _exec_get_macro)

register("timeDiff", lambda ts: dt.Int64.with_nullable(
    any(t.nullable for t in ts)),
    lambda args, t: ColVal(t, args[1].data.astype(jnp.int64)
                           - args[0].data.astype(jnp.int64), _andv(args)))


# ------------------------------------------------- higher-order fn surface
# arrayMap/Filter/... are intercepted by the analyzer (lambda binding,
# plan/analyzer.py _HIGHER_ORDER); these registry entries give them a
# system.functions presence and a typed error if called without a lambda.

def _lambda_only(name):
    def ex(args, out_dtype):
        raise TypeError_(f"{name} expects a lambda first argument")
    register(name, lambda ts: dt.UInt8, ex)


for _n in ("arrayMap", "arrayFilter", "arrayExists", "arrayAll",
           "arrayCount", "arrayFirstIndex", "arrayFold"):
    _lambda_only(_n)
from . import functions_ext6 as _functions_ext6  # noqa: E402,F401
