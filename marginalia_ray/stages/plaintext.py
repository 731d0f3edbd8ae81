"""PlainTextLogic (M23): title/description heuristics for text/plain docs.

Faithful port of the reference's
``converting-process/.../processor/logic/PlainTextLogic.java`` (title via
underline / ==== sideline ==== / blank-second-line heuristics, filename
fallback; description by joining the prose-looking first lines) and
``converting/util/LineUtils.java:13-45`` (CR/LF/CRLF/LFCR-agnostic line
splitter).  Used by the tokenizer's plain-text branch the way
``PlainTextDocumentProcessorPlugin.java:60-120`` uses it.

Two reference quirks are kept deliberately (bug-for-bug parity):

* ``is_underline`` / ``is_sideline`` compute the trailing-whitespace scan
  against ``s[start]`` instead of ``s[end]`` (PlainTextLogic.java:79-81,
  108-110), so ``end`` always lands on the final character;
* ``is_underline`` never examines that final character (the run-check loop
  is ``i < end``), so ``"=======X"`` still counts as an underline.
"""

from __future__ import annotations

import re

_WS_RE = re.compile(r"\s+")
_NON_ALNUM_RE = re.compile(r"[^a-zA-Z0-9]+")
_RULE_CHARS = "=_*"


def first_n_lines(body: str, n: int) -> list[str]:
    """LineUtils.firstNLines: newline-convention-agnostic, keeps empties."""
    lines: list[str] = []
    eat_cr = eat_lf = False
    start = 0
    for pos, ch in enumerate(body):
        if len(lines) >= n:
            break
        if ch == "\r":
            if eat_cr:
                eat_cr = False
            else:
                eat_lf = True
                lines.append(body[start:pos])
            start = pos + 1
        elif ch == "\n":
            if eat_lf:
                eat_lf = False
            else:
                eat_cr = True
                lines.append(body[start:pos])
            start = pos + 1
        else:
            eat_cr = eat_lf = False
    return lines


def _rule_bounds(s: str) -> tuple[int, int]:
    """The shared start/end scan, including the charAt(start) quirk."""
    start = 0
    while start < len(s) and s[start].isspace():
        start += 1
    end = len(s) - 1
    while end > start:
        if not s[start].isspace():  # reference bug: start, not end
            break
        end -= 1
    return start, end


def is_underline(s: str) -> bool:
    """A line that is (nearly) all one of ``= _ *`` — a title underline."""
    start, end = _rule_bounds(s)
    if end - start < 8:
        return False
    if s[start] not in _RULE_CHARS:
        return False
    c = s[start]
    for i in range(start, end):  # final char exempt, as in the reference
        if s[i] != c:
            return False
    return True


def is_sideline(s: str) -> bool:
    """``==== HEADER ====``-style heading detector."""
    start, end = _rule_bounds(s)
    if end - start < 8:
        return False
    c = s[start]
    if c not in _RULE_CHARS:
        return False
    if c != s[end]:
        return False
    while start < end and s[start] == c:
        start += 1
    if end - start < 4:
        return False
    while end > start and s[end] == c:
        end -= 1
    if end - start < 4:
        return False
    return True


def get_title(url_path: str, first_few_lines: list[str]) -> str:
    """PlainTextLogic.getTitle: underline > sideline > lede > filename."""
    # drop mailing-list-header-ish "Key: value" lines
    candidates = [
        ln for ln in first_few_lines if not (len(ln) < 32 and ":" in ln)
    ]

    for i in range(1, len(candidates)):
        if is_underline(candidates[i]):
            cand = candidates[i - 1].strip()
            if len(cand) > 16:
                return cand[:128]

    for ln in first_few_lines:
        if is_sideline(ln):
            return _NON_ALNUM_RE.sub(" ", ln).strip()

    if (
        len(candidates) >= 2
        and not candidates[1].strip()
        and len(candidates[0].strip()) > 16
    ):
        return candidates[0].strip()

    return _file_name_from_path(url_path)


def _file_name_from_path(path: str) -> str:
    last_slash = path.rfind("/")
    if last_slash + 1 < len(path):
        return path[last_slash + 1 :]
    return path


def _looks_like_text(s: str) -> bool:
    s = s.strip()
    if len(s) < 16:
        return False
    return 4 * sum(ch.isalpha() for ch in s) > 3 * len(s)


def get_description(first_few_lines: list[str]) -> str:
    """PlainTextLogic.getDescription: join the prose lines, cap at 255."""
    joined = " ".join(ln for ln in first_few_lines if _looks_like_text(ln))
    return _WS_RE.sub(" ", joined)[:255]
