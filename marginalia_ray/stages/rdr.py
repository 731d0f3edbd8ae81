"""RDR (Ripple-Down Rules) POS tagger — evaluator port.

Faithful port of the reference's bundled RDRPOSTagger evaluator
(/root/reference/third-party/rdrpostagger/src/main/java/com/github/datquocnguyen/
 RDRPOSTagger.java:59-180, InitialTagger.java:112-160, Utils.java:74-180,
 FWObject.java:14-52): the tab-indented rules file becomes a node tree with
except / if-not edges over a 13-slot context window
(tag, word, prevWord1, prevTag1, prevWord2, prevTag2, nextWord1, nextTag1,
 nextWord2, nextTag2, suffixL2, suffixL3, suffixL4), and tagging a word walks
the tree keeping the deepest satisfied node.

The trained English.RDR / English.DICT artifacts are download-time assets
(run/setup.sh:23-24 fetches them from the public RDRPOSTagger repo) and are
not part of the reference checkout, so this module loads a deterministic
built-in stand-in model (marginalia_ray/stages/rdr_data.py) written in the
exact same wire format: a frequency dictionary of closed-class and common
English words plus a hand-authored contextual rule tree.  The evaluator
itself is model-agnostic — pointing ``RdrTagger`` at the real English.RDR /
English.DICT files reproduces the reference tagger bit-for-bit.
"""

from __future__ import annotations

# Context slot layout — FWObject.java:29-33 (comment) / Utils.getCondition
SLOT_TAG = 0
SLOT_WORD = 1
SLOT_PREV_WORD1 = 2
SLOT_PREV_TAG1 = 3
SLOT_PREV_WORD2 = 4
SLOT_PREV_TAG2 = 5
SLOT_NEXT_WORD1 = 6
SLOT_NEXT_TAG1 = 7
SLOT_NEXT_WORD2 = 8
SLOT_NEXT_TAG2 = 9
SLOT_SUFFIX_L2 = 10
SLOT_SUFFIX_L3 = 11
SLOT_SUFFIX_L4 = 12

_CONDITION_KEYS = {
    "prevWord2": SLOT_PREV_WORD2,
    "prevTag2": SLOT_PREV_TAG2,
    "prevWord1": SLOT_PREV_WORD1,
    "prevTag1": SLOT_PREV_TAG1,
    "word": SLOT_WORD,
    "tag": SLOT_TAG,
    "nextWord1": SLOT_NEXT_WORD1,
    "nextTag1": SLOT_NEXT_TAG1,
    "nextWord2": SLOT_NEXT_WORD2,
    "nextTag2": SLOT_NEXT_TAG2,
    "suffixL2": SLOT_SUFFIX_L2,
    "suffixL3": SLOT_SUFFIX_L3,
    "suffixL4": SLOT_SUFFIX_L4,
}

# FWObject context prototype: unfilled word/tag/suffix slots carry these
# placeholder values, which conditions written as "" match against
# (Utils.getConcreteValue, FWObject.contextPrototype).
_PROTO = ("<T>", "<W>", "<W>", "<T>", "<W>", "<T>", "<W>", "<T>", "<W>", "<T>", "<SFX>", "<SFX>", "<SFX>")


def _concrete_value(s: str) -> str:
    """Utils.getConcreteValue — '""' means the placeholder for the slot kind."""
    if '""' in s:
        if "Word" in s:
            return "<W>"
        if "suffixL" in s:
            return "<SFX>"
        return "<T>"
    return s[s.index('"') + 1 : -1]


def _parse_condition(s: str) -> list[tuple[int, str]]:
    """Utils.getCondition — 'object.key == "value" and ...' -> (slot, value)."""
    out = []
    for rule in s.split(" and "):
        rule = rule.strip()
        key = rule[rule.index(".") + 1 : rule.index(" ")]
        out.append((_CONDITION_KEYS[key], _concrete_value(rule)))
    return out


class RdrTree:
    """The rule tree: parallel arrays with except/if-not/father links
    (RDRPOSTagger.java:22-113)."""

    def __init__(self, rules_text: str):
        # node i: conditions[i] = list[(slot, value)], conclusions[i] = tag
        self.conditions: list[list[tuple[int, str]]] = []
        self.conclusions: list[str] = []
        self.except_idx: list[int] = []
        self.if_not_idx: list[int] = []
        self.father_idx: list[int] = []
        self.depth: list[int] = []

        def add_node(cond, concl, d):
            idx = len(self.conclusions)
            self.conditions.append(cond)
            self.conclusions.append(concl)
            self.except_idx.append(-1)
            self.if_not_idx.append(-1)
            self.father_idx.append(-1)
            self.depth.append(d)
            return idx

        lines = rules_text.splitlines()
        # first line is a header, skipped (RDRPOSTagger.java:66-67)
        current = add_node([], "NN", 0)
        current_depth = 0
        for line in lines[1:]:
            d = 0
            for i in range(min(7, len(line))):
                if line[i] == "\t":
                    d += 1
                else:
                    break
            line = line.strip()
            if not line or "cc:" in line:
                continue
            cond_str, concl_str = line.split(" : ")
            cond = _parse_condition(cond_str.strip())
            concl = _concrete_value(concl_str.strip())
            new_idx = add_node(cond, concl, d)
            if d > current_depth:
                self.except_idx[current] = new_idx
            elif d == current_depth:
                self.if_not_idx[current] = new_idx
            else:
                while self.depth[current] != d:
                    current = self.father_idx[current]
                self.if_not_idx[current] = new_idx
            self.father_idx[new_idx] = current
            current = new_idx
            current_depth = d

        # Fast dispatch: when every depth-1 node is a single-condition
        # identity rule on the tag slot (true of the real English.RDR and of
        # the built-in model), the root's if-not chain scan reduces to a
        # dict lookup, and tags whose identity rule has no exceptions can
        # skip context construction entirely.
        self.dispatch: dict[str, int] | None = {}
        node = self.except_idx[0]
        while node >= 0:
            cond = self.conditions[node]
            if len(cond) != 1 or cond[0][0] != SLOT_TAG or cond[0][1] in self.dispatch:
                self.dispatch = None
                break
            self.dispatch[cond[0][1]] = node
            node = self.if_not_idx[node]

    def find_fired(self, context: tuple[str, ...]) -> str:
        """findFiredNode — deepest node whose condition the context satisfies
        (RDRPOSTagger.java:115-144)."""
        current = 0
        fired = -1
        conditions = self.conditions
        while current >= 0:
            ok = True
            for slot, value in conditions[current]:
                if context[slot] != value:
                    ok = False
                    break
            if ok:
                fired = current
                current = self.except_idx[current]
            else:
                current = self.if_not_idx[current]
        return self.conclusions[fired] if fired >= 0 else ""


# ---------------------------------------------------------------------------
# InitialTagger — lexical backbone (InitialTagger.java:11-160, verbatim
# including the endsWith("vbg")/endsWith("vbn") quirk).


def _jj1(s: str) -> bool:
    idx = s.find("-")
    while idx >= 0:
        if idx > 0 and s[idx - 1].isdigit():
            return True
        if idx + 1 < len(s) and s[idx + 1].isdigit():
            return True
        idx = s.find("-", idx + 1)
    return False


def _nn(s: str) -> bool:
    return (
        s.endswith(("ness", "ment", "ship"))
        or s.startswith(("Ex", "ex", "Self-", "self-"))
    )


def _jj2(s: str) -> bool:
    return s.startswith(("Inter", "inter", "Dis", "dis", "Anti", "anti"))


def _jj3(s: str) -> bool:
    return "-" in s or s.endswith(("ful", "ous", "ble", "ic", "ive", "est", "able", "al"))


def _url(s: str) -> bool:
    p = s.find(".")
    return 0 <= p != len(s) - 1


def _cd(s: str) -> bool:
    return any(c.isdigit() for c in s)


def initial_tag(word: str, dictionary: dict[str, str]) -> str:
    """InitialTagger.getTagForWordEn, ported verbatim."""
    if '"' in word or "“" in word or "”" in word:
        return dictionary.get("''", "''")
    if word in "[]()<>!":  # Java String.contains(word): substring check
        return "?"
    t = dictionary.get(word)
    if t is not None:
        return t
    t = dictionary.get(word.lower())
    if t is not None:
        return t
    if _jj1(word):
        return "JJ"
    if _url(word):
        return "NN"
    if _cd(word):
        return "CD"
    if _nn(word):
        return "NN"
    if word[0].islower() and word.endswith("s"):
        return "NNS"
    if word[0].isupper():
        return "NNP"
    if _jj2(word):
        return "JJ"
    if word.endswith("vbg"):  # sic — InitialTagger.java:104-109
        return "VBG"
    if word.endswith("vbn"):
        return "VBN"
    if _jj3(word):
        return "JJ"
    if word.endswith("ly"):
        return "RB"
    return "NN"


class RdrTagger:
    """tagsForEnSentence: initial-tag each word, then run the rule tree over
    the 5-word/tag context window (RDRPOSTagger.java:162-177,
    Utils.getObject:140-180)."""

    def __init__(self, dictionary: dict[str, str], rules_text: str):
        self.dictionary = dictionary
        self.tree = RdrTree(rules_text)
        self._init_cache: dict[str, str] = {}

    @classmethod
    def default(cls) -> "RdrTagger":
        from marginalia_ray.stages.rdr_data import EN_DICT_TEXT, EN_RULES_TEXT

        return cls(parse_dict(EN_DICT_TEXT), EN_RULES_TEXT)

    def _initial(self, word: str) -> str:
        cache = self._init_cache
        t = cache.get(word)
        if t is None:
            if len(cache) > 1_000_000:
                cache.clear()
            t = initial_tag(word, self.dictionary)
            cache[word] = t
        return t

    def tag_sentence(self, words: list[str]) -> list[str]:
        n = len(words)
        if n == 0:
            return []
        cache = self._init_cache
        init = []
        for w in words:
            t = cache.get(w)
            if t is None:
                if len(cache) > 1_000_000:
                    cache.clear()
                t = initial_tag(w, self.dictionary)
                cache[w] = t
            init.append(t)
        tree = self.tree
        dispatch = tree.dispatch
        tags: list[str] = []
        for i in range(n):
            w = words[i]
            if dispatch is not None:
                node = dispatch.get(init[i], -1)
                if node < 0:
                    # no depth-1 rule for this tag: root fires, chain misses
                    tags.append(tree.conclusions[0])
                    continue
                if tree.except_idx[node] < 0:
                    # identity rule with no exceptions: tag is final
                    tags.append(tree.conclusions[node])
                    continue
            nc = len(w)
            context = (
                init[i],
                w,
                words[i - 1] if i > 0 else "<W>",
                init[i - 1] if i > 0 else "<T>",
                words[i - 2] if i > 1 else "<W>",
                init[i - 2] if i > 1 else "<T>",
                words[i + 1] if i < n - 1 else "<W>",
                init[i + 1] if i < n - 1 else "<T>",
                words[i + 2] if i < n - 2 else "<W>",
                init[i + 2] if i < n - 2 else "<T>",
                w[nc - 2 :] if nc >= 4 else "<SFX>",
                w[nc - 3 :] if nc >= 4 else "<SFX>",
                w[nc - 4 :] if nc >= 5 else "<SFX>",
            )
            tags.append(tree.find_fired(context))
        return tags


def parse_dict(text: str) -> dict[str, str]:
    """Utils.getDictionary — 'word tag' lines."""
    d: dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split(" ")
        if len(parts) >= 2:
            d[parts[0]] = parts[1]
    return d


_DEFAULT: RdrTagger | None = None


def default_tagger() -> RdrTagger:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = RdrTagger.default()
    return _DEFAULT
