"""Byte-level BPE ENCODING under a fixed, committed vocabulary — the
production token counter (GPT-2-family byte-level BPE: Sennrich 2016
merges over Radford 2019's byte-to-unicode alphabet), complementing
the TRAINERS in operators/bpe.py (L38/L38b) and the heuristic
``bpe_token_count`` regex estimate in functions/text.py.

Pipeline (identical in the Spark plan, the DuckDB oracle twin, and
the pure-Python reference used by the unit tests):

1. **Pre-tokenize** with ``PRETOKEN_RE`` — a lookahead-free variant of
   the GPT-2 pattern (`` ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+``):
   leading single space attaches to the following word, so the space
   information survives into the byte alphabet. Deviations from
   GPT-2's exact pattern, both deliberate: no contraction alternates
   (``'s|'t|…``) and no ``\\s+(?!\\S)`` lookahead — RE2 (the DuckDB
   regex engine) has no lookahead, and the twin must run the SAME
   pattern.
2. **Byte-map**: UTF-8 bytes → printable unicode symbols via the
   public GPT-2 ``bytes_to_unicode`` bijection (printable latin-1
   bytes map to themselves, the rest shift to 256+k), so every
   symbol is one non-space character and merge boundaries stay
   visible in a plain string.
3. **Merge** by vocabulary rank. Encoding applies merges lowest rank
   first, replace-all left-to-right non-overlapping — provably
   equivalent to the min-rank-pair loop of the reference encoder,
   because a merge at rank r can only CREATE pairs containing its new
   symbol, and every pair containing a symbol born at rank r has rank
   > r (it could not be learned before the symbol existed). The Spark
   side is therefore a chain of ``replace`` calls over the
   double-space segment encoding of operators/bpe.py — one codegen'd
   string op per merge, no Python in the plan.

The committed vocabulary ``VOCAB_MERGES`` (64 merges) is trained at
import time by the pure-Python trainer over ``FIXTURE_CORPUS`` — a
public-domain literal (UDHR article 1 + pangrams) — so it is fully
deterministic, self-contained, and inspection-friendly; a production
deployment swaps in its released merge list through the same
``merges`` parameter.

Scale: the registered query encodes each DISTINCT word once (the
vocabulary trick: token cost is |vocab| × |merges| string ops, not
corpus × merges) and joins counts back — the same posture that lets
the trainers run at 100 TB.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "  "  # double-space separator; byte symbols never contain spaces

PRETOKEN_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte↔unicode bijection: every printable
    latin-1 byte maps to itself; the remaining bytes map to 256+k in
    first-gap order. All 256 images are printable non-space chars."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


BYTE_ENCODER = bytes_to_unicode()


def _is_l(ch: str) -> bool:
    return ch.isalpha()


def _is_n(ch: str) -> bool:
    return ch.isnumeric()


def pretokenize_py(s: str) -> list[str]:
    """Pure-Python reference of PRETOKEN_RE's leftmost-first scan —
    used by tests to pin the Spark/DuckDB regexp behavior."""
    toks: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        j = i
        lead = 0
        if c == " " and i + 1 < n and not s[i + 1].isspace():
            lead, j = 1, i + 1
        c2 = s[j] if j < n else ""
        if j < n and _is_l(c2):
            k = j
            while k < n and _is_l(s[k]):
                k += 1
        elif j < n and _is_n(c2):
            k = j
            while k < n and _is_n(s[k]):
                k += 1
        elif j < n and not c2.isspace():
            k = j
            while k < n and not s[k].isspace() and not _is_l(s[k]) and not _is_n(s[k]):
                k += 1
        else:
            # whitespace run (no following word to attach to)
            k = i
            while k < n and s[k].isspace():
                k += 1
            toks.append(s[i:k])
            i = k
            continue
        toks.append(s[i:k])  # includes the attached leading space
        i = k
    return toks


def word_to_symbols(word: str) -> list[str]:
    """UTF-8 bytes of ``word`` as byte-alphabet symbols."""
    return [BYTE_ENCODER[b] for b in word.encode("utf-8")]


def _merge_word(syms: list[str], a: str, b: str) -> list[str]:
    """Left-to-right non-overlapping merge of adjacent (a, b)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_byte_merges(corpus: str, n_merges: int) -> list[tuple[str, str]]:
    """Pure-Python byte-level BPE trainer (standard Sennrich loop:
    count every adjacent symbol pair weighted by word frequency, merge
    the most frequent — ties lexicographic — everywhere, repeat).
    Deterministic, so the committed VOCAB_MERGES is reproducible."""
    freq: Counter[tuple[str, ...]] = Counter()
    for tok in pretokenize_py(corpus):
        freq[tuple(word_to_symbols(tok))] += 1
    words = dict(freq)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, f in words.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = {
            tuple(_merge_word(list(syms), *best)): f
            for syms, f in words.items()
        }
    return merges


# Public-domain fixture corpus: UDHR article 1 + classic pangrams —
# the committed "fixed public vocab" the default encode runs under.
FIXTURE_CORPUS = (
    "All human beings are born free and equal in dignity and rights. "
    "They are endowed with reason and conscience and should act "
    "towards one another in a spirit of brotherhood. "
    "The quick brown fox jumps over the lazy dog. "
    "Pack my box with five dozen liquor jugs. 1234567890."
)

VOCAB_MERGES: list[tuple[str, str]] = train_byte_merges(FIXTURE_CORPUS, 64)


def encode_word_py(
    word: str, merges: list[tuple[str, str]] | None = None
) -> list[str]:
    """Reference encoder: repeatedly merge the LOWEST-RANK adjacent
    pair present (the GPT-2 encoder loop). The Spark replace-chain is
    tested token-for-token against this."""
    if merges is None:
        merges = VOCAB_MERGES
    ranks = {pair: r for r, pair in enumerate(merges)}
    syms = word_to_symbols(word)
    while len(syms) > 1:
        best, best_rank = None, None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = pair, r
        if best is None:
            break
        syms = _merge_word(syms, *best)
    return syms


def encode_py(
    text: str, merges: list[tuple[str, str]] | None = None
) -> list[str]:
    """Reference full-text encode: pretokenize, encode each word."""
    out: list[str] = []
    for tok in pretokenize_py(text):
        out.extend(encode_word_py(tok, merges))
    return out


# -- Spark side -------------------------------------------------------------

_HEX_TO_SYM = {f"{b:02X}": s for b, s in BYTE_ENCODER.items()}


def _byte_map_col():
    pairs: list = []
    for hx, sym in _HEX_TO_SYM.items():
        pairs.append(F.lit(hx))
        pairs.append(F.lit(sym))
    return F.create_map(*pairs)


def byte_bpe_encode_words(
    words: DataFrame,
    word_col: str = "w",
    merges: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """(word, symbols array<string>, n_tokens) for each input word —
    the whole chain is JVM-side: hex the UTF-8 bytes, split into hex
    pairs, byte-map through a map literal, then one ``replace`` per
    merge over the double-space segment string."""
    if merges is None:
        merges = VOCAB_MERGES
    hexpairs = F.regexp_extract_all(
        F.hex(F.encode(F.col(word_col), "UTF-8")), F.lit(".."), 0
    )
    syms = F.transform(hexpairs, lambda p: F.element_at(_byte_map_col(), p))
    seg = F.concat(F.lit(SEP), F.array_join(syms, SEP), F.lit(SEP))
    out = words.withColumn("_seg", seg)
    for a, b in merges:
        out = out.withColumn(
            "_seg",
            F.replace(
                F.col("_seg"),
                F.lit(" " + a + SEP + b + " "),
                F.lit(" " + a + b + " "),
            ),
        )
    symbols = F.split(F.trim(F.col("_seg")), SEP)
    return out.select(
        F.col(word_col),
        symbols.alias("symbols"),
        F.size(symbols).cast("long").alias("n_tokens"),
    )
