"""Search front-end command dispatch: the special-command chain the
reference's search service runs every query through before falling back
to full-text search.

Ports (services-core/search-service/src/main/java/nu/marginalia/search/):
  * ``CommandEvaluator`` (command/CommandEvaluator.java:12-45) — the
    ordered special commands (browse, convert, define, site, bang); the
    default search command always runs last and must produce a result.
  * ``BrowseCommand`` (command/commands/BrowseCommand.java:30-122) —
    ``browse:`` keyword routing: ``browse:random`` /
    ``browse:random:N`` pull a random-set page, anything else resolves
    the domain and pulls cosine neighbors (256), supplemented with the
    old-algorithm cascade (50) when fewer than 25 survive cleaning.
  * ``BrowseResultCleaner`` (results/BrowseResultCleaner.java:14-28) —
    a per-call predicate closure removing screenshot-less results and
    domain-hash duplicates.
  * ``BrowseResult.domainHash`` (browse/model/BrowseResult.java:7-13) —
    a ``www`` subdomain collapses onto the bare domain.
  * ``SearchUnitConversionService`` (svc/SearchUnitConversionService.
    java:18-80) — the conversion-detection regex feeding the Units
    converter and the eval predicate feeding the MathParser (with the
    all-digits short-circuit).
  * ``ConvertCommand`` / ``DefinitionCommand`` / ``SiteListCommand``
    (command/commands/*.java) — pattern routing; the DB/assistant
    clients behind define:/site: are injected providers (their data —
    the dictionary table, the domain-info tables — is DB state, not
    code; see DictionaryService / DomainInformationService).

Results are plain ``CommandResult(kind, payload)`` records — rendering
(mustache templates) is presentation, out of scope per SURVEY §0.
Determinism deviation (documented): BrowseCommand's final
``Collections.shuffle`` is reproduced only when an ``rng`` is injected;
by default results keep their deterministic pre-shuffle order.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable, Optional, Sequence

from .bang import bang_redirect
from .dating import BrowseResult
from .eval import MathParser, Units
from ..functions.urls import parse_url


@dataclass(frozen=True)
class CommandResult:
    kind: str  # browse | convert | define | site | bang | search
    payload: Any


def domain_hash(url: str) -> str:
    """BrowseResult.domainHash (BrowseResult.java:7-13): a ``www``
    subdomain collapses onto the bare domain so www/apex mirror pages
    dedup; any other subdomain keeps the full host."""
    p = parse_url(url)
    if p.subdomain == "www":
        return p.top_domain
    return p.fqdn


def browse_result_cleaner(
    has_screenshot: Callable[[int], bool],
) -> Callable[[BrowseResult], bool]:
    """BrowseResultCleaner.shouldRemoveResultPredicate (BrowseResult
    Cleaner.java:22-28): a FRESH closure per call — the seen-hash set
    does not persist between cleaning passes.  Returns True = remove."""
    seen: set[str] = set()

    def should_remove(res: BrowseResult) -> bool:
        if not has_screenshot(res.domain_id):
            return True
        h = domain_hash(res.url)
        if h in seen:
            return True
        seen.add(h)
        return False

    return should_remove


class BrowseCommand:
    """BrowseCommand.java:30-122."""

    PATTERN = re.compile(r"^browse:[.A-Za-z\-0-9:]+$")
    PREFIX = "browse:"

    def __init__(
        self,
        random_provider: Callable[[int, int], Sequence[BrowseResult]],
        similar_provider: Callable[[int, int], Sequence[BrowseResult]],
        old_algo_provider: Callable[[int, int], Sequence[BrowseResult]],
        domain_id_lookup: Callable[[str], Optional[int]],
        has_screenshot: Callable[[int], bool],
        rng=None,
    ) -> None:
        self.random_provider = random_provider  # (count, set) -> results
        self.similar_provider = similar_provider  # (domain_id, count)
        self.old_algo_provider = old_algo_provider  # (domain_id, count)
        self.domain_id_lookup = domain_id_lookup
        self.has_screenshot = has_screenshot
        self.rng = rng

    def process(self, query: str) -> Optional[CommandResult]:
        if not self.PATTERN.match(query):
            return None
        # browseSite catches every failure and yields null -> the
        # evaluator moves on to the next command (BrowseCommand.java:73-95)
        try:
            results = self._browse_site(query)
        except Exception:
            return None
        if results is None:
            return None
        return CommandResult("browse", results)

    def _browse_site(self, human_query: str):
        word = human_query[len(self.PREFIX):].lower()
        if word == "random":
            return self._random_entries(0)
        if word.startswith("random:"):
            return self._random_entries(int(word.split(":")[1]))
        return self._related_entries(word)

    def _random_entries(self, domain_set: int):
        results = list(self.random_provider(25, domain_set))
        remove = browse_result_cleaner(self.has_screenshot)
        return [r for r in results if not remove(r)]

    def _related_entries(self, word: str):
        domain_id = self.domain_id_lookup(word)
        if domain_id is None:
            raise KeyError(word)  # getDomainId throws on unknown domains
        neighbors = list(self.similar_provider(domain_id, 256))
        remove = browse_result_cleaner(self.has_screenshot)
        neighbors = [r for r in neighbors if not remove(r)]

        # thin results: supplement with the old algorithm, set-dedup, and
        # clean again with a FRESH predicate (BrowseCommand.java:105-115)
        if len(neighbors) < 25:
            all_neighbors = dict.fromkeys(neighbors)
            all_neighbors.update(
                dict.fromkeys(self.old_algo_provider(domain_id, 50))
            )
            remove2 = browse_result_cleaner(self.has_screenshot)
            neighbors = [r for r in all_neighbors if not remove2(r)]

        if self.rng is not None:  # Collections.shuffle
            self.rng.shuffle(neighbors)
        return neighbors


class SearchUnitConversion:
    """SearchUnitConversionService.java:18-80 — the detection regexes,
    wired to the ported Units / MathParser instead of the assistant
    RPC."""

    CONVERSION_PATTERN = re.compile(
        r"((\d+|\s+|[.()\-^+%*/]|log[^a-z]|log2[^a-z]|sqrt[^a-z]|log10"
        r"|cos[^a-z]|sin[^a-z]|tan[^a-z]|log2|pi[^a-z]|e[^a-z]|2pi[^a-z])+)"
        r"\s*([a-zA-Z][a-zA-Z^.0-9]*\s?[a-zA-Z^.0-9]*)"
        r"\s+in\s+([a-zA-Z^.0-9]+\s?[a-zA-Z^.0-9]*)"
    )
    EVAL_PATTERN = re.compile(
        r"(\d+|\s+|[.()\-^+%*/]|log|log2|sqrt|log10|cos|sin|tan|pi|e|2pi)+"
    )

    def __init__(self, units: Units | None = None, parser: MathParser | None = None):
        self.parser = parser or MathParser()
        self.units = units or Units(self.parser)

    def try_conversion(self, query: str) -> Optional[str]:
        m = self.CONVERSION_PATTERN.fullmatch(query)
        if not m:
            return None
        value, from_unit, to_unit = m.group(1), m.group(3), m.group(4)
        try:
            return self.units.convert(value, from_unit, to_unit)
        except Exception:
            return None  # RemoteException -> empty

    def try_eval(self, query: str) -> Optional[str]:
        if not self.EVAL_PATTERN.fullmatch(query):
            return None
        expr = query.lower().strip()
        if expr.isdigit():  # allMatch(isDigit) short-circuit
            return None
        try:
            return self.parser.eval_formatted(expr)
        except Exception:
            return None


class ConvertCommand:
    """ConvertCommand.java:15-37: any query the conversion regex accepts
    renders the unit conversion instead of searching."""

    def __init__(self, conversion: SearchUnitConversion | None = None):
        self.conversion = conversion or SearchUnitConversion()

    def process(self, query: str) -> Optional[CommandResult]:
        result = self.conversion.try_conversion(query)
        if result is None:
            return None
        return CommandResult("convert", {"query": query, "result": result})


class DefinitionCommand:
    """DefinitionCommand.java:22-67: ``define:word`` -> dictionary
    lookup.  The dictionary table is DB data; the lookup is an injected
    provider returning the entry list (or raising -> fall through)."""

    PATTERN = re.compile(r"^define:[A-Za-z0-9\s\-]+$")
    PREFIX = "define:"

    def __init__(self, dictionary_provider: Callable[[str], Any]):
        self.dictionary_provider = dictionary_provider

    def process(self, query: str) -> Optional[CommandResult]:
        if not self.PATTERN.match(query.strip()):
            return None
        word = query.strip()[len(self.PREFIX):].lower()
        return CommandResult(
            "define", {"word": word, "entries": self.dictionary_provider(word)}
        )


class SiteListCommand:
    """SiteListCommand.java:27-122: ``site:domain`` -> domain info plus
    the site-restricted result list.  Domain-info aggregation and the
    site search are injected providers (DomainInformationService reads
    DB aggregates; the search runs ``site:<domain>`` through the normal
    query factory with the CORPO profile, count 100)."""

    PATTERN = re.compile(r"^site:[.A-Za-z\-0-9]+$")
    PREFIX = "site:"

    def __init__(
        self,
        domain_info_provider: Callable[[str], Optional[dict]],
        site_search_provider: Callable[[str], list],
        domain_id_lookup: Callable[[str], Optional[int]],
    ):
        self.domain_info_provider = domain_info_provider
        self.site_search_provider = site_search_provider
        self.domain_id_lookup = domain_id_lookup

    def process(self, query: str) -> Optional[CommandResult]:
        if not self.PATTERN.match(query):
            return None
        word = query[len(self.PREFIX):].lower()
        info = self.domain_info_provider(word)
        if info is None:
            # unknownSite(): suggest the domain for crawling
            info = {"domain": word, "unknown_domain": True,
                    "suggest_for_crawling": True}
            results: list = []
            domain_id = -1
        else:
            results = self.site_search_provider(f"site:{word}")
            did = self.domain_id_lookup(word)
            domain_id = did if did is not None else -1
        screenshot = f"/screenshot/{domain_id if domain_id > 0 else 0}"
        return CommandResult(
            "site",
            {
                "query": query,
                "info": info,
                "results": results,
                "domain_id": domain_id,
                "screenshot": screenshot,
                "focus_domain": word,
            },
        )


class BangCommandAdapter:
    """BangCommand via the ported redirect table (query/bang.py)."""

    def process(self, query: str) -> Optional[CommandResult]:
        url = bang_redirect(query)
        if url is None:
            return None
        return CommandResult("bang", {"redirect": url})


class CommandEvaluator:
    """CommandEvaluator.java:12-45: special commands in declaration
    order — browse, convert, define, site, bang — then the default
    search, which must return a result."""

    def __init__(
        self,
        browse: BrowseCommand,
        convert: ConvertCommand,
        define: DefinitionCommand,
        site: SiteListCommand,
        search: Callable[[str], Any],
        bang: BangCommandAdapter | None = None,
    ):
        self.special = [browse, convert, define, site, bang or BangCommandAdapter()]
        self.search = search

    def eval(self, query: str) -> CommandResult:
        for cmd in self.special:
            ret = cmd.process(query)
            if ret is not None:
                return ret
        result = self.search(query)
        if result is None:
            raise RuntimeError("Search Command returned Optional.empty()!")
        return CommandResult("search", result)
