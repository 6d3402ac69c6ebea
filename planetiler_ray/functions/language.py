"""Name-tag handling: valid-name filter, latin detection, and a
deterministic transliteration stage — ``util/LanguageUtils.java:18-118``
semantics, columnar.

The reference filters junk name tags (``name:left``/``name:right``/
``name:etymology…``/wikidata refs), prefers an existing latin name
(``name:en`` → ``name:de`` → any latin-script ``name:*``), and falls
back to ICU transliteration in a thread-local transliterator
(``ThreadLocalTransliterator.java`` — stateful per-thread init).

Offline re-expression: latin detection is a vectorized codepoint-range
test over the concatenated character stream; transliteration is a
deterministic table (Cyrillic, Greek, common Latin diacritics) applied
through a numpy codepoint gather — an actor-pool stage
(``Transliterate``) whose table builds once per actor, the ICU-handle
analog.  The container has no ICU, so the table is the sanctioned
offline stand-in; the stage boundary (actor ``__init__`` state, batch
``__call__``) is the real contract.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# name keys the reference EXCLUDES from translation handling
# (LanguageUtils.java:34-48)
_EXCLUDED_NAME_KEY = re.compile(
    r"^name:(left|right|etymology|signed|botanical)([:_].*)?$|"
    r"^name:source$|^name:prefix$|^name:suffix$|^name:full$|"
    r"^name:(etymology:)?wikidata$|^name:(etymology:)?wikipedia$")

# valid "name:<lang>" keys: 2-3 letter code + optional script + any
# -/_-separated subtags, case-insensitive — accepts the common OSM
# romanization keys like name:ja_rm / name:zh_pinyin
# (LanguageUtils.java VALID_NAME_TAGS semantics)
_VALID_NAME_KEY = re.compile(
    r"^name:[a-zA-Z]{2,3}(-[a-zA-Z]{4})?([-_](x-)?[a-zA-Z0-9]{1,8})*$",
    re.IGNORECASE)


def is_valid_name_key(keys) -> np.ndarray:
    """Vectorized valid-``name:lang``-tag mask (excludes the reference's
    junk keys)."""
    ks = np.asarray(keys, object)
    return np.array([bool(k) and _VALID_NAME_KEY.match(k) is not None
                     and _EXCLUDED_NAME_KEY.match(k) is None
                     for k in ks], bool)


# latin script ranges (LanguageUtils.java:96-118 containsOnlyLatin):
# Basic Latin..Latin Extended-D + punctuation/space/digits
_LATIN_RANGES = np.array([
    (0x0000, 0x02FF),      # latin + extensions + IPA + spacing modifiers
    (0x1E00, 0x1EFF),      # latin extended additional
    (0x2000, 0x206F),      # general punctuation
    (0xA720, 0xA7FF),      # latin extended-D
], dtype=np.int64)


def is_latin(strings) -> np.ndarray:
    """True where every codepoint of the string is latin-script (or
    empty=False) — vectorized over the concatenated char stream."""
    arr = [s if isinstance(s, str) else "" for s in
           np.asarray(strings, object)]
    lens = np.array([len(s) for s in arr], np.int64)
    if lens.sum() == 0:
        return np.zeros(len(arr), bool)
    flat = np.frombuffer("".join(arr).encode("utf-32-le"),
                         np.uint32).astype(np.int64)
    ok = np.zeros(len(flat), bool)
    for lo, hi in _LATIN_RANGES:
        ok |= (flat >= lo) & (flat <= hi)
    starts = np.zeros(len(arr), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # per-string AND over its chars: count of ok chars == length
    # (reduceat only over non-empty strings — empty entries would
    # corrupt their neighbors' segment bounds)
    nz = lens > 0
    ok_counts = np.zeros(len(arr), np.int64)
    if nz.any():
        ok_counts[nz] = np.add.reduceat(ok.astype(np.int64), starts[nz])
    return (ok_counts == lens) & nz


def _translit_table() -> dict[int, str]:
    """Deterministic Cyrillic + Greek + diacritic fold table."""
    cyr = {
        "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e",
        "ё": "e", "ж": "zh", "з": "z", "и": "i", "й": "y", "к": "k",
        "л": "l", "м": "m", "н": "n", "о": "o", "п": "p", "р": "r",
        "с": "s", "т": "t", "у": "u", "ф": "f", "х": "kh", "ц": "ts",
        "ч": "ch", "ш": "sh", "щ": "shch", "ъ": "", "ы": "y", "ь": "",
        "э": "e", "ю": "yu", "я": "ya",
    }
    grk = {
        "α": "a", "β": "v", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
        "η": "i", "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m",
        "ν": "n", "ξ": "x", "ο": "o", "π": "p", "ρ": "r", "σ": "s",
        "ς": "s", "τ": "t", "υ": "y", "φ": "f", "χ": "ch", "ψ": "ps",
        "ω": "o",
        # accented vowels (tonos/dialytika)
        "ά": "a", "έ": "e", "ή": "i", "ί": "i", "ό": "o", "ύ": "y",
        "ώ": "o", "ϊ": "i", "ϋ": "y", "ΐ": "i", "ΰ": "y",
    }
    diac = {"à": "a", "á": "a", "â": "a", "ä": "a", "ã": "a", "å": "a",
            "ç": "c", "è": "e", "é": "e", "ê": "e", "ë": "e", "ì": "i",
            "í": "i", "î": "i", "ï": "i", "ñ": "n", "ò": "o", "ó": "o",
            "ô": "o", "ö": "o", "õ": "o", "ø": "o", "ù": "u", "ú": "u",
            "û": "u", "ü": "u", "ý": "y", "ß": "ss", "æ": "ae",
            "œ": "oe", "đ": "d", "ł": "l", "š": "s", "ž": "z", "č": "c",
            "ć": "c", "ř": "r", "ů": "u", "ě": "e", "ş": "s", "ğ": "g",
            "ı": "i", "ą": "a", "ę": "e", "ń": "n", "ś": "s", "ź": "z",
            "ż": "z"}
    table: dict[int, str] = {}
    for src in (cyr, grk, diac):
        for ch, out in src.items():
            table[ord(ch)] = out
            up = ch.upper()
            if up != ch and len(up) == 1:
                table[ord(up)] = out.capitalize()
    return table


class Transliterate:
    """Actor-pool stage: add a ``latin_name`` column — the element's own
    latin name if present, else the transliterated fallback.

    Table/regex state builds once per actor (``__init__`` — the ICU
    handle analog); ``__call__`` is a numpy codepoint gather: known
    codepoints map through a dense lookup of replacement strings, the
    rest pass through.
    """

    def __init__(self):
        t = _translit_table()
        max_cp = max(t) + 1
        self.repl = np.full(max_cp, None, dtype=object)
        for cp, out in t.items():
            self.repl[cp] = out
        self.max_cp = max_cp

    def _fold(self, cp: int) -> str:
        """One codepoint → latin: the curated table first, else a
        general stdlib NFKD decomposition with combining marks
        stripped (covers the long tail of Latin-script diacritics the
        table does not enumerate — ń-with-caron, Vietnamese tone
        stacks, fullwidth forms...).  Non-decomposable codepoints pass
        through unchanged (the documented non-ICU residue)."""
        if cp < self.max_cp and self.repl[cp] is not None:
            return self.repl[cp]
        ch = chr(cp)
        if cp < 128:
            return ch
        import unicodedata
        dec = unicodedata.normalize("NFKD", ch)
        folded = "".join(c for c in dec
                         if not unicodedata.combining(c))
        return folded if folded and folded != ch else ch

    def transliterate(self, strings) -> list[str]:
        from .cjk import fold_cjk, is_cjk
        out = []
        for s in strings:
            if s is None:
                out.append(None)
                continue
            cps = np.frombuffer(s.encode("utf-32-le"), np.uint32)
            if not (cps > 127).any():
                out.append(s)
                continue
            if any(is_cjk(int(c)) for c in cps[cps > 0x3000]):
                # CJK needs run context (kana digraphs, han spacing) —
                # the string scanner handles it, non-CJK chars fall
                # back to the per-codepoint fold below
                out.append(fold_cjk(s, self._fold))
                continue
            out.append("".join(self._fold(int(c)) for c in cps))
        return out

    def __call__(self, batch: pa.Table, name_col: str = "name") -> pa.Table:
        names = batch[name_col].to_numpy(zero_copy_only=False)
        latin = is_latin(names)
        # fold only the NON-latin rows — latin rows keep the original
        # name, so paying the per-codepoint fold for them is pure waste
        latin_name = names.copy()
        todo = np.flatnonzero(~latin)
        if len(todo):
            latin_name[todo] = np.asarray(
                self.transliterate([names[i] for i in todo]), object)
        return batch.append_column("latin_name",
                                   pa.array(latin_name, pa.string()))
