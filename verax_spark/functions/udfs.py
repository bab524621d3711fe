"""Arrow-batched Pandas UDFs for Presto functions with no Column-expression
equivalent (crypto MACs, Unicode normalization, stemming).

These are the documented slow path (see pyspark guide: UDFs only where
built-ins genuinely can't express the semantics). Everything here is
stdlib-only (hashlib/hmac/unicodedata) plus an original implementation of
the published Porter (1980) stemming algorithm, matching the reference's
Presto function surface (reference registers the Presto library wholesale,
axiom/optimizer/FunctionRegistry.h:111-295).
"""

from __future__ import annotations

import hashlib
import hmac as _hmac
import unicodedata

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# NOTE: return types must be DataType instances, not DDL strings — workers
# re-import this module and parsing a DDL string needs an active session.


def _make_hmac_udf(algo: str):
    @pandas_udf(StringType())
    def _udf(msg: pd.Series, key: pd.Series) -> pd.Series:
        def one(m, k):
            if m is None or k is None:
                return None
            mb = m if isinstance(m, bytes) else str(m).encode("utf-8")
            kb = k if isinstance(k, bytes) else str(k).encode("utf-8")
            return _hmac.new(kb, mb, getattr(hashlib, algo)).hexdigest()

        return pd.Series([one(m, k) for m, k in zip(msg, key)])

    return _udf


# Presto hmac_*(varbinary, varbinary) -> varbinary; we take string-or-binary
# and return the lowercase hex digest (consistent with the shim's md5/sha
# convention of hex-string outputs).
hmac_md5 = _make_hmac_udf("md5")
hmac_sha1 = _make_hmac_udf("sha1")
hmac_sha256 = _make_hmac_udf("sha256")
hmac_sha512 = _make_hmac_udf("sha512")


@pandas_udf(StringType())
def _normalize_udf(s: pd.Series, form: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if v is None else unicodedata.normalize(f or "NFC", v)
            for v, f in zip(s, form)
        ]
    )


def normalize(s: Column, form: str = "NFC") -> Column:
    """Presto normalize(string[, form]) — Unicode normalization."""
    form = str(form).upper()
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"normalize: unsupported form {form!r}")
    return _normalize_udf(s, F.lit(form))


# --------------------------------------------------------------------------
# Porter stemmer (Porter, 1980, "An algorithm for suffix stripping") —
# original implementation of the published algorithm.
# --------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in [C](VC){m}[V]."""
    m, prev_v = 0, False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    if not (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
    ):
        return False
    return w[-1] not in "wxy"


def porter_stem(word: str) -> str:
    w = word.lower()
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2 (m > 0 suffix mappings)
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
        ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
        ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
        ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
        ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
        ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 4 (m > 1 suffix removal)
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
        "ize",
    ):
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


@pandas_udf(StringType())
def word_stem(s: pd.Series) -> pd.Series:
    return pd.Series([None if v is None else porter_stem(v) for v in s])


def register_udfs(spark) -> None:
    """Expose the UDF-backed Presto names to SQL text (functionExists-able)."""
    spark.udf.register("hmac_md5", hmac_md5)
    spark.udf.register("hmac_sha1", hmac_sha1)
    spark.udf.register("hmac_sha256", hmac_sha256)
    spark.udf.register("hmac_sha512", hmac_sha512)
    spark.udf.register("word_stem", word_stem)
    # 2-arg form: normalize(s, 'NFC'); the SQL front door fills the default
    spark.udf.register("normalize", _normalize_udf)
