"""HTML feature extraction (M20) + adblock simulation (M21) + topic
detectors: the `special:*` / `category:*` synthetic-keyword sources.

Reference semantics (studied, not copied):
  - FeatureExtractor.getFeatures:
      /root/reference/code/processes/converting-process/src/main/java/nu/marginalia/converting/processor/logic/FeatureExtractor.java:63-137
  - HtmlFeature keywords: .../common/model/src/main/java/nu/marginalia/model/crawl/HtmlFeature.java:5-16
  - AdblockSimulator (rule parse + DOM visitor):
      /root/reference/code/features-convert/adblock/src/main/java/nu/marginalia/adblock/AdblockSimulator.java:58-180
  - GoogleAnwersSpamDetector: .../adblock/GoogleAnwersSpamDetector.java:7-36
  - Recipe/Woodworking/TextileCraft detectors (term-weight vote with
    0.5*old+new merge and sqrt length penalty):
      /root/reference/code/features-convert/topic-detection/src/main/java/nu/marginalia/topic/*.java

The reference loads an EasyList file from disk for the adblock rules (and
its production hasAds() is currently short-circuited off); this rebuild
ships a small built-in rule set exercising every rule type and ENABLES the
visitor — pass custom `rules` to AdblockRules for a full list.
"""

from __future__ import annotations

import math
import re

from marginalia_ray.functions.stemmer import stem

# ---- HtmlFeature keywords (HtmlFeature.java ordinal order) -------------

FEATURE_MEDIA = "special:media"
FEATURE_JS = "special:scripts"
FEATURE_AFFILIATE = "special:affiliate"
FEATURE_TRACKING = "special:tracking"
FEATURE_COOKIES = "special:cookies"
FEATURE_FOOD = "category:food"
FEATURE_ADS = "special:ads"
FEATURE_CRAFTS = "category:crafts"
FEATURE_GA_SPAM = "special:gaspam"

# FeatureExtractor.trackers (FeatureExtractor.java:25-44)
TRACKERS = (
    "adform.net", "connect.facebook", "googletagmanager.com",
    "googlesyndication.com", "google.com", "twitter.com",
    "smartadserver.com", "doubleclick.com", "2mdn.com", "dmtry.com",
    "bing.com", "msn.com", "amazon-adsystem.com", "alexametrics.com",
    "rubiconproject.com", "chango.com", "d5nxst8fruw4z.cloudfront.net",
    "d31qbv1cthcecs.cloudfront.net", "linkedin.com",
)


# ---- AdblockSimulator (M21) --------------------------------------------

# Built-in defaults covering the three rule types the parser supports
# (element-id, element-class, script-src patterns in EasyList syntax).
DEFAULT_AD_RULES = (
    "[Adblock Plus 2.0]",
    "###ad",
    "###ads",
    "###ad-banner",
    "###banner-ad",
    "##.ad",
    "##.ads",
    "##.advert",
    "##.ad-banner",
    "##.adsbygoogle",
    "##.sponsored",
    "/ads/*",
    "||doubleclick.net^$script",
    "||googlesyndication.com^",
    "adframe.",
    "banner*.gif",
)


class AdblockRules:
    """EasyList-subset rule engine (AdblockSimulator.addRule/toRegexMatcher
    semantics): `###x` -> id rule, `##.x` -> class rule, plain patterns ->
    script-src predicates with the ^ -> [?/], * -> .*, leading || ->
    ^http[s]?:// rewrites.  First line of the rule file is skipped."""

    def __init__(self, rules: tuple[str, ...] = DEFAULT_AD_RULES):
        self.id_rules: set[str] = set()
        self.class_rules: set[str] = set()
        self.script_rules: list = []  # predicates str -> bool
        for s in rules[1:]:
            self._add_rule(s)

    def _add_rule(self, s: str) -> None:
        try:
            if s.startswith("##") and ":" not in s:
                if s.startswith("###"):
                    self.id_rules.add(s[3:])
                elif s.startswith("##."):
                    self.class_rules.add(s[3:])
            elif s.startswith("/^"):
                end = s.find("[^\\]/")
                if end >= 0:
                    pat = re.compile(s[1 : end + 1])
                    self.script_rules.append(lambda x, p=pat: p.search(x) is not None)
            elif not s.startswith("!") and "#" not in s and not s.startswith("@@"):
                if "$" not in s:
                    self.script_rules.append(self._to_matcher(s))
                elif "$script" in s and "domain=" not in s:
                    self.script_rules.append(self._to_matcher(s[: s.index("$")]))
        except re.error:
            pass

    @staticmethod
    def _to_matcher(s: str):
        original = s
        if not s.strip():
            return lambda x: False
        if re.fullmatch(r"[&?=/A-Za-z0-9._-]+", s):
            if s.startswith("/"):
                return lambda x: x == original
            return lambda x: original in x
        if re.fullmatch(r"[&?=/A-Za-z0-9._-]+\*", s):
            prefix = original[:-1]
            return lambda x: x.startswith(prefix)
        s = s.replace("?", "\\?").replace(".", "\\.")
        s = s.replace("^", "[?/]").replace("*", ".*")
        if s.startswith("||"):
            s = "^http[s]?://.*" + s[2:]
        s = s.replace("|", "\\|")
        pat = re.compile(s)
        return lambda x, p=pat: p.search(x) is not None

    def has_ads(self, root) -> bool:
        """RuleVisitor: early-stop DFS; any element matching an id, class
        or script-src rule marks the page."""
        stack = [root]
        while stack:
            n = stack.pop()
            if n.tag is not None and n.attrs:
                if n.attrs.get("id") in self.id_rules:
                    return True
                cls = n.attrs.get("class") or ""
                if cls and (set(cls.split()) & self.class_rules):
                    return True
                if n.tag == "script":
                    src = n.attrs.get("src") or ""
                    for rule in self.script_rules:
                        if rule(src):
                            return True
            stack.extend(n.children)
        return False


_DEFAULT_ADBLOCK = AdblockRules()


# ---- GoogleAnwersSpamDetector ------------------------------------------

_GA_PREFIXES = ("What", "Why", "How", "When", "Is")


def _ga_spam_from_headings(headings: dict[str, list]) -> bool:
    """Any of h1/h2/h3 where >4 headings and >50% start with a question
    prefix (the single shared rule; callers collect the heading nodes)."""
    for tag in ("h1", "h2", "h3"):
        els = headings.get(tag) or []
        if not els:
            continue
        positive = sum(1 for el in els if el.get_text().startswith(_GA_PREFIXES))
        if positive > 4 and positive / len(els) > 0.5:
            return True
    return False


def ga_spam_p(root) -> float:
    """testP over a full tree (tests / standalone use; the converter path
    feeds collected headings to _ga_spam_from_headings directly)."""
    return 1.0 if _ga_spam_from_headings(
        {t: root.find_all(t) for t in ("h1", "h2", "h3")}
    ) else 0.0


# ---- DOM-side features (everything except the topic categories) --------


def extract_dom_features(root, rules: AdblockRules | None = None) -> set[str]:
    """FeatureExtractor.getFeatures, DOM portion: JS / TRACKING /
    AFFILIATE_LINK / MEDIA / ADVERTISEMENT / GA_SPAM.  COOKIES needs crawl
    metadata our page table does not carry and is applied by the caller
    when a `cookies` column exists."""
    features: set[str] = set()
    rules = rules if rules is not None else _DEFAULT_ADBLOCK

    # ONE tree walk collects every node class this extractor consults
    # (scripts, head links, media tags, anchors, headings) — the naive
    # form is 6+ separate find_all passes on the hottest converter path.
    scripts: list = []
    head_links: list = []
    anchors: list = []
    headings: dict[str, list] = {"h1": [], "h2": [], "h3": []}
    has_media = False
    in_head_links = []
    stack = [(root, False)]
    while stack:
        n, in_head = stack.pop()
        tag = n.tag
        if tag == "script":
            scripts.append(n)
        elif tag == "a":
            anchors.append(n)
        elif tag in ("object", "audio", "video"):
            has_media = True
        elif tag in ("h1", "h2", "h3"):
            headings[tag].append(n)
        elif tag == "link" and in_head:
            head_links.append(n)
        nh = in_head or tag == "head"
        for c in n.children:
            if not c.is_text():
                stack.append((c, nh))

    for s in scripts:
        if (s.attrs.get("type") or "").lower() != "application/ld+json":
            features.add(FEATURE_JS)
            break
    if FEATURE_JS not in features:
        for link in head_links:
            if "onerror" in link.attrs or "onload" in link.attrs:
                features.add(FEATURE_JS)
                break

    if FEATURE_JS in features and rules.has_ads(root):
        features.add(FEATURE_ADS)

    if has_media:
        features.add(FEATURE_MEDIA)

    script_blob_parts = []
    for s in scripts:
        src = s.attrs.get("src") or ""
        if any(t in src for t in TRACKERS):
            features.add(FEATURE_TRACKING)
            break
        script_blob_parts.extend(c.text for c in s.children if c.is_text())
    if FEATURE_TRACKING not in features and "google-analytics.com" in "".join(
        script_blob_parts
    ):
        features.add(FEATURE_TRACKING)

    for a in anchors:
        href = (a.attrs.get("href") or "").lower()
        if "amzn.to/" in href or ("amazon.com/" in href and "tag=" in href):
            features.add(FEATURE_AFFILIATE)
            break

    if _ga_spam_from_headings(headings):
        features.add(FEATURE_GA_SPAM)

    return features


# ---- topic detectors ----------------------------------------------------

def _stem_table(raw: dict[str, float]) -> dict[str, float]:
    out: dict[str, float] = {}
    for w, v in raw.items():
        out[stem(w)] = v  # later duplicates overwrite, like repeated put()
    return out


# RecipeDetector.java term weights (AVG_RECIPE_LENGTH = 250)
RECIPE_TERMS = _stem_table({
    "ingredients": 0.3, "recipe": 0.1, "preparations": 0.1, "instructions": 0.1,
    "menu": -0.5,
    "email": -0.15, "checkout": -0.15, "reviews": -0.15, "newsletter": -0.15,
    "dl": 0.05, "l": 0.05, "g": 0.05, "ml": 0.05, "tsp": 0.05,
    "teaspoons": 0.05, "tbsp": 0.05, "tablespoons": 0.05, "cups": 0.05,
    "quarts": 0.05, "pints": 0.05,
    "grate": 0.05, "cut": 0.05, "peel": 0.05, "chop": 0.05, "slice": 0.05,
    "debone": 0.05, "julienne": 0.05, "saute": 0.05, "fry": 0.05,
    "boil": 0.05, "parboil": 0.05, "roast": 0.05, "grill": 0.05,
    "sear": 0.05, "heat": 0.05, "dice": 0.05, "bake": 0.05, "strain": 0.05,
    "melt": 0.05, "garnish": 0.05, "preheat": 0.05, "sprinkle": 0.05,
    "spritz": 0.05,
    "colander": 0.05, "pot": 0.05, "pan": 0.05, "oven": 0.05, "stove": 0.05,
    "skillet": 0.05, "wok": 0.05, "knife": 0.05, "grater": 0.05,
    "yeast": 0.025, "sourdough": 0.025, "flour": 0.025, "sugar": 0.025,
    "rye": 0.025, "wheat": 0.025, "dough": 0.025, "rise": 0.025,
    "lettuce": 0.025, "onions": 0.025, "parsnips": 0.025, "beets": 0.025,
    "carrots": 0.025, "chilies": 0.025, "peppers": 0.025, "chives": 0.025,
    "tomatoes": 0.025, "salad": 0.025, "leeks": 0.025, "shallots": 0.025,
    "avocado": 0.025, "asparagus": 0.025, "cucumbers": 0.025,
    "eggplants": 0.025, "broccoli": 0.025, "kale": 0.025, "jalapeno": 0.025,
    "habanero": 0.025, "mushrooms": 0.025, "shiitake": 0.025,
    "chanterelles": 0.025,
    "meat": 0.025, "beef": 0.025, "chicken": 0.025, "turkey": 0.025,
    "cheese": 0.025, "pork": 0.025, "tofu": 0.025, "salmon": 0.025,
    "cod": 0.025, "veal": 0.025, "eggs": 0.025, "lentils": 0.025,
    "chickpeas": 0.025, "rice": 0.025, "noodles": 0.025, "beans": 0.025,
    "ramen": 0.025, "miso": 0.025, "natto": 0.025, "udon": 0.025,
    "soba": 0.025, "shichimi": 0.025, "nori": 0.025, "kimchi": 0.025,
    "salt": 0.025, "oil": 0.025, "olive": 0.025, "feta": 0.025,
    "parmesan": 0.025, "mozzarella": 0.025, "gouda": 0.025,
    "mayonnaise": 0.025, "butter": 0.025, "pepper": 0.025, "garlic": 0.025,
    "sriracha": 0.025, "sambal": 0.025, "soy": 0.025, "cumin": 0.025,
    "thyme": 0.025, "basil": 0.025, "oregano": 0.025, "cilantro": 0.025,
    "ginger": 0.025, "curry": 0.025, "water": 0.025, "lemons": 0.025,
    "melons": 0.025, "cherries": 0.025, "apples": 0.025, "pears": 0.025,
    "chocolate": 0.025, "vanilla": 0.025, "milk": 0.025, "creamer": 0.025,
    "quark": 0.025, "cream": 0.025, "cake": 0.025, "pie": 0.025,
    "crust": 0.025, "bread": 0.025, "omelet": 0.025, "soup": 0.025,
})
RECIPE_AVG_LENGTH = 250

_SHOP_TERMS = {
    "shop": -0.1, "newsletter": -0.1, "cart": -0.1, "item": -0.025,
    "price": -0.1, "book": -0.1, "order": -0.1, "exhibition": -0.1,
}

# WoodworkingDetector.java (AVG_LENGTH = 1000)
WOODWORKING_TERMS = _stem_table({
    **_SHOP_TERMS,
    "apse": 0.01, "baluster": 0.01, "beam": 0.01, "cornice": 0.01,
    "drill": 0.01, "nail": 0.01, "saw": 0.01, "hacksaw": 0.01,
    "bandsaw": 0.01, "whipsaw": 0.01, "gimlet": 0.01, "clamp": 0.01,
    "glue": 0.01, "cut": 0.01, "plane": 0.01, "sand": 0.01, "bevel": 0.01,
    "chamfer": 0.01, "dado": 0.075, "dowel": 0.05, "dovetail": 0.05,
    "joint": 0.01, "level": 0.01, "edge": 0.01, "face": 0.01,
    "fibreboard": 0.01, "fiberboard": 0.01, "battens": 0.01,
    "furring": 0.01, "glulam": 0.025, "hardboard": 0.025, "hardwood": 0.01,
    "jamb": 0.015, "kerf": 0.025, "lvl": 0.025, "laminated": 0.01,
    "lignin": 0.01, "mitre": 0.01, "mortise": 0.015, "mullion": 0.01,
    "newel": 0.01, "nogging": 0.01, "ogee": 0.01, "ogive": 0.01,
    "ovolo": 0.01, "drawknife": 0.01, "plywood": 0.01, "purlin": 0.01,
    "riser": 0.01, "sapwood": 0.01, "shingle": 0.01, "softwood": 0.01,
    "stave": 0.01, "stopper": 0.01, "stud": 0.01, "transom": 0.01,
    "v-joint": 0.015, "veneer": 0.01, "quartersaw": 0.015, "screw": 0.01,
    "woodturning": 0.01, "pine": 0.005, "balsa": 0.01, "poplar": 0.005,
    "nut": 0.01, "bolt": 0.01, "tack": 0.01, "hinge": 0.01, "brass": 0.01,
    "fitting": 0.01, "diy": 0.015, "dozuki": 0.01,
})
WOODWORKING_AVG_LENGTH = 1000

# TextileCraftDetector.java (AVG_LENGTH = 1000)
TEXTILE_TERMS = _stem_table({
    **_SHOP_TERMS,
    "knit": 0.05, "stitch": 0.05, "yarn": 0.05, "crochet": 0.05,
    "ravelry": 0.15, "stockinette": 0.075, "purl": 0.075, "ksp": 0.075,
    "kwise": 0.075, "k2tog": 0.075, "k1b": 0.075, "psso": 0.075,
    "p2sso": 0.075, "pwise": 0.075, "yrn": 0.075, "yon": 0.075,
    "entrelac": 0.075, "thrum": 0.075, "bobbin": 0.025, "boucle": 0.075,
    "lopi": 0.075, "eyelash": 0.01, "variegated": 0.075, "serge": 0.04,
    "selvage": 0.075, "topstitch": 0.075, "gauge": 0.01, "design": 0.01,
    "pattern": 0.01, "layer": 0.01, "color": 0.01, "colour": 0.01,
    "chart": 0.01, "grid": 0.01, "wool": 0.01, "acrylic": 0.01,
    "loose": 0.01, "loop": 0.01, "needle": 0.01, "row": 0.01,
    "circular": 0.01, "sew": 0.01, "size": 0.01, "repeat": 0.01,
    "repetition": 0.01, "basketweave": 0.01, "weave": 0.01, "loom": 0.01,
    "warp": 0.01, "weft": 0.01, "shuttle": 0.01, "brioche": 0.01,
    "spool": 0.01, "hem": 0.01, "bodice": 0.01, "seam": 0.01,
    "allowance": 0.01, "crinoline": 0.01, "petticoat": 0.01,
    "armscye": 0.01, "baste": 0.01, "cord": 0.01, "darning": 0.01,
    "draping": 0.01, "embroider": 0.01, "eyelet": 0.01, "godet": 0.01,
    "gore": 0.01, "grain": 0.01, "jersey": 0.01, "lining": 0.01,
    "muslin": 0.01, "needlework": 0.01, "pleat": 0.01, "quilt": 0.01,
    "silk": 0.01, "sloper": 0.01, "surplice": 0.01, "thread": 0.01,
    "twill": 0.01, "ch": 0.01, "sp": 0.01, "sl": 0.01, "sc": 0.01,
    "ss": 0.01, "hdc": 0.01, "turn": 0.01, "skip": 0.01, "round": 0.01,
    "ring": 0.01, "sequin": 0.01, "bobble": 0.01, "puff": 0.01,
    "v-stitch": 0.01,
})
TEXTILE_AVG_LENGTH = 1000


def topic_score(dld, term_values: dict[str, float], avg_length: int) -> float:
    """testP: per-term merge(0.5*old + new) over stemmed word occurrences,
    summed, scaled by sqrt(AVG)/sqrt(max(AVG, n_words))."""
    values: dict[str, float] = {}
    count = 0
    for sent in dld.sentences:
        for st in sent.stemmed:
            count += 1
            v = term_values.get(st)
            if v is not None:
                old = values.get(st)
                values[st] = v if old is None else 0.5 * old + v
    if count == 0:
        return 0.0
    penalty = math.sqrt(avg_length) / math.sqrt(max(avg_length, count))
    return sum(values.values()) * penalty


def topic_features(dld) -> set[str]:
    """FeatureExtractor.java:128-132: recipe > 0.5 -> category:food, else
    woodworking > 0.3 or textile > 0.3 -> category:crafts.

    The reference's per-occurrence merge (0.5*old + new) telescopes: k
    occurrences of a term with weight v sum to v*(2 - 2^(1-k)), so the
    score is computed from the doc's existing stem->count table in one
    pass over DISTINCT stems — identical result, no per-word loop."""
    count = dld.total_num_words
    if count == 0:
        return set()
    sums = [0.0, 0.0, 0.0]
    tables = (RECIPE_TERMS, WOODWORKING_TERMS, TEXTILE_TERMS)
    for st, cnt in dld.word_counts.items():
        for k, tbl in enumerate(tables):
            v = tbl.get(st)
            if v is not None:
                sums[k] += v * (2.0 - 2.0 ** (1 - cnt))

    def score(total: float, avg: int) -> float:
        return total * (math.sqrt(avg) / math.sqrt(max(avg, count)))

    if score(sums[0], RECIPE_AVG_LENGTH) > 0.5:
        return {FEATURE_FOOD}
    if (
        score(sums[1], WOODWORKING_AVG_LENGTH) > 0.3
        or score(sums[2], TEXTILE_AVG_LENGTH) > 0.3
    ):
        return {FEATURE_CRAFTS}
    return set()
