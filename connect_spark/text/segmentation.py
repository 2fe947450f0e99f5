"""UAX #29 text segmentation for the Bloblang `unicode_segments`
method (reference: internal/impl/lang/bloblang.go:70-120 — uniseg's
FirstGraphemeClusterInString / FirstWordInString /
FirstSentenceInString; segments concatenate back to the input).

- grapheme: the `regex` module's ``\\X`` (extended grapheme clusters,
  UAX #29 compliant — family-emoji ZWJ sequences, skin tones, flags).
- word / sentence: the UAX #29 rule sets (WB1–WB999, SB1–SB998)
  implemented here over per-codepoint Word_Break / Sentence_Break
  property lookups served from the `regex` module's Unicode character
  database (the "vendored table" — a public UCD copy that ships with
  the container's Python, kept current with the Unicode version).
"""

from __future__ import annotations

from functools import lru_cache

import regex

__all__ = ["graphemes", "words", "sentences", "unicode_segments"]

_X = regex.compile(r"\X")


def graphemes(s: str) -> list[str]:
    return _X.findall(s)


# --- property classification ----------------------------------------

_WB_PROPS = [
    "CR", "LF", "Newline", "ZWJ", "WSegSpace", "Extend", "Format",
    "Katakana", "Hebrew_Letter", "ALetter", "Single_Quote",
    "Double_Quote", "MidNumLet", "MidLetter", "MidNum", "Numeric",
    "ExtendNumLet", "Regional_Indicator",
]
_SB_PROPS = [
    "CR", "LF", "Extend", "Format", "Sep", "Sp", "Lower", "Upper",
    "OLetter", "Numeric", "ATerm", "SContinue", "STerm", "Close",
]

_wb_res = [(p, regex.compile(rf"\p{{Word_Break={p}}}")) for p in _WB_PROPS]
_sb_res = [
    (p, regex.compile(rf"\p{{Sentence_Break={p}}}")) for p in _SB_PROPS
]
_extpict = regex.compile(r"\p{Extended_Pictographic}")


@lru_cache(maxsize=4096)
def _wb(ch: str) -> str:
    for name, rx in _wb_res:
        if rx.match(ch):
            return name
    return "Other"


@lru_cache(maxsize=4096)
def _sb(ch: str) -> str:
    for name, rx in _sb_res:
        if rx.match(ch):
            return name
    return "Other"


@lru_cache(maxsize=4096)
def _is_extpict(ch: str) -> bool:
    return bool(_extpict.match(ch))


# --- word boundaries (UAX #29 §4.1) ---------------------------------

_AHLetter = ("ALetter", "Hebrew_Letter")
_MidNumLetQ = ("MidNumLet", "Single_Quote")


def _word_breaks(s: str) -> list[int]:
    """Boundary offsets (code-point indices) including 0 and len(s)."""
    n = len(s)
    props = [_wb(c) for c in s]
    breaks = [0]

    def skip_ignore_back(i: int) -> int:
        """Index of the first non-(Extend|Format|ZWJ) char at or
        before i, or -1 (WB4: X (Extend|Format|ZWJ)* -> X)."""
        while i >= 0 and props[i] in ("Extend", "Format", "ZWJ"):
            i -= 1
        return i

    for i in range(1, n):
        left_raw = props[i - 1]
        right = props[i]

        # WB3: CR x LF
        if left_raw == "CR" and right == "LF":
            continue
        # WB3a: (Newline|CR|LF) ÷
        if left_raw in ("Newline", "CR", "LF"):
            breaks.append(i)
            continue
        # WB3b: ÷ (Newline|CR|LF)
        if right in ("Newline", "CR", "LF"):
            breaks.append(i)
            continue
        # WB3c: ZWJ x ExtPict
        if left_raw == "ZWJ" and _is_extpict(s[i]):
            continue
        # WB3d: WSegSpace x WSegSpace
        if left_raw == "WSegSpace" and right == "WSegSpace":
            continue
        # WB4: x (Extend|Format|ZWJ)
        if right in ("Extend", "Format", "ZWJ"):
            continue

        # effective left: skip trailing ignorables (WB4)
        li = skip_ignore_back(i - 1)
        if li < 0:
            breaks.append(i)
            continue
        left = props[li]

        def prev_effective(j: int) -> str | None:
            j = skip_ignore_back(j)
            return props[j] if j >= 0 else None

        # WB5
        if left in _AHLetter and right in _AHLetter:
            continue
        # WB6: AHLetter x (MidLetter|MidNumLetQ) AHLetter
        if (
            left in _AHLetter
            and right in ("MidLetter",) + _MidNumLetQ
        ):
            k = i + 1
            while k < n and props[k] in ("Extend", "Format", "ZWJ"):
                k += 1
            if k < n and props[k] in _AHLetter:
                continue
        # WB7: AHLetter (MidLetter|MidNumLetQ) x AHLetter
        if right in _AHLetter and left in ("MidLetter",) + _MidNumLetQ:
            before = prev_effective(li - 1)
            if before in _AHLetter:
                continue
        # WB7a: Hebrew_Letter x Single_Quote
        if left == "Hebrew_Letter" and right == "Single_Quote":
            continue
        # WB7b: Hebrew_Letter x Double_Quote Hebrew_Letter
        if left == "Hebrew_Letter" and right == "Double_Quote":
            k = i + 1
            while k < n and props[k] in ("Extend", "Format", "ZWJ"):
                k += 1
            if k < n and props[k] == "Hebrew_Letter":
                continue
        # WB7c: Hebrew_Letter Double_Quote x Hebrew_Letter
        if right == "Hebrew_Letter" and left == "Double_Quote":
            before = prev_effective(li - 1)
            if before == "Hebrew_Letter":
                continue
        # WB8 / WB9 / WB10
        if left == "Numeric" and right == "Numeric":
            continue
        if left in _AHLetter and right == "Numeric":
            continue
        if left == "Numeric" and right in _AHLetter:
            continue
        # WB11: Numeric (MidNum|MidNumLetQ) x Numeric
        if right == "Numeric" and left in ("MidNum",) + _MidNumLetQ:
            before = prev_effective(li - 1)
            if before == "Numeric":
                continue
        # WB12: Numeric x (MidNum|MidNumLetQ) Numeric
        if left == "Numeric" and right in ("MidNum",) + _MidNumLetQ:
            k = i + 1
            while k < n and props[k] in ("Extend", "Format", "ZWJ"):
                k += 1
            if k < n and props[k] == "Numeric":
                continue
        # WB13
        if left == "Katakana" and right == "Katakana":
            continue
        # WB13a / WB13b
        if (
            left in _AHLetter + ("Numeric", "Katakana", "ExtendNumLet")
            and right == "ExtendNumLet"
        ):
            continue
        if left == "ExtendNumLet" and right in _AHLetter + (
            "Numeric",
            "Katakana",
        ):
            continue
        # WB15/WB16: regional indicator pairs (count preceding RIs)
        if left == "Regional_Indicator" and right == "Regional_Indicator":
            cnt = 0
            j = li
            while j >= 0:
                j2 = skip_ignore_back(j)
                if j2 >= 0 and props[j2] == "Regional_Indicator":
                    cnt += 1
                    j = j2 - 1
                else:
                    break
            if cnt % 2 == 1:
                continue
        breaks.append(i)
    breaks.append(n)
    return breaks


# --- sentence boundaries (UAX #29 §5.1) -----------------------------

_SATerm = ("ATerm", "STerm")
_ParaSep = ("Sep", "CR", "LF")


def _sentence_breaks(s: str) -> list[int]:
    n = len(s)
    props = [_sb(c) for c in s]
    breaks = [0]

    def eff(i: int) -> int:
        """Skip (Extend|Format) backwards (SB5)."""
        while i >= 0 and props[i] in ("Extend", "Format"):
            i -= 1
        return i

    for i in range(1, n):
        left_raw = props[i - 1]
        right = props[i]

        # SB3: CR x LF
        if left_raw == "CR" and right == "LF":
            continue
        # SB4: ParaSep ÷
        if left_raw in _ParaSep:
            breaks.append(i)
            continue
        # SB5: x (Extend|Format)
        if right in ("Extend", "Format") and left_raw not in _ParaSep:
            continue

        li = eff(i - 1)
        if li < 0:
            continue
        left = props[li]

        # SB6: ATerm x Numeric
        if left == "ATerm" and right == "Numeric":
            continue
        # SB7: (Upper|Lower) ATerm x Upper
        if left == "ATerm" and right == "Upper":
            before = eff(li - 1)
            if before >= 0 and props[before] in ("Upper", "Lower"):
                continue

        # scan back over Sp* Close* SATerm (for SB8–SB11)
        j = li
        seen_sp = seen_close = False
        while j >= 0 and props[j] == "Sp":
            seen_sp = True
            j = eff(j - 1)
        while j >= 0 and props[j] == "Close":
            seen_close = True
            j = eff(j - 1)
        sa = j >= 0 and props[j] in _SATerm
        sa_kind = props[j] if sa else None

        if sa:
            # SB8: ATerm Close* Sp* x (not (OLetter|Upper|Lower|
            #      ParaSep|SATerm))* Lower
            if sa_kind == "ATerm":
                k = i
                ok = False
                while k < n:
                    pk = props[k]
                    if pk == "Lower":
                        ok = True
                        break
                    if pk in (
                        "OLetter",
                        "Upper",
                        "Sep",
                        "CR",
                        "LF",
                        "ATerm",
                        "STerm",
                    ):
                        break
                    k += 1
                if ok:
                    continue
            # SB8a: SATerm Close* Sp* x (SContinue|SATerm)
            if right in ("SContinue",) + _SATerm:
                continue
            # SB9: SATerm Close* x (Close|Sp|ParaSep)
            if not seen_sp and right in ("Close", "Sp") + _ParaSep:
                continue
            # SB10: SATerm Close* Sp* x (Sp|ParaSep)
            if right in ("Sp",) + _ParaSep:
                continue
            # SB11: SATerm Close* Sp* ParaSep? ÷
            breaks.append(i)
            continue
        # SB998: no break
    breaks.append(n)
    return breaks


def _split(s: str, breaks: list[int]) -> list[str]:
    return [s[a:b] for a, b in zip(breaks, breaks[1:]) if a < b]


def words(s: str) -> list[str]:
    """UAX #29 words — includes punctuation and whitespace runs, and
    concatenates back to the input (uniseg FirstWordInString)."""
    return _split(s, sorted(set(_word_breaks(s))))


def sentences(s: str) -> list[str]:
    """UAX #29 sentences — trailing spaces stay with the sentence."""
    return _split(s, sorted(set(_sentence_breaks(s))))


def unicode_segments(s: str, segmentation_type: str) -> list[str]:
    if segmentation_type == "grapheme":
        return graphemes(s)
    if segmentation_type == "word":
        return words(s)
    if segmentation_type == "sentence":
        return sentences(s)
    raise ValueError(
        f"unknown segmentation type: {segmentation_type}"
    )
