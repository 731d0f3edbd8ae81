"""URL parsing/normalization (EdgeUrl/EdgeDomain, M25 in SURVEY.md §2).

Reference: /root/reference/code/common/model/src/main/java/nu/marginalia/model/EdgeUrl.java,
EdgeDomain.java.  Provides proto/domain/path split, subdomain vs top-domain
split, and TLD, which feed UrlKeywords (K7) and MetaTagsBuilder (M11)."""

from __future__ import annotations

from dataclasses import dataclass
from urllib.parse import urlsplit

# 2-label TLDs where the top domain keeps three labels (simplified from
# EdgeDomain's suffix logic)
_TWO_LEVEL_TLDS = {"co.uk", "ac.uk", "com.au", "co.jp", "or.jp", "co.nz", "com.br"}


@dataclass(frozen=True)
class ParsedUrl:
    proto: str
    fqdn: str  # full host, e.g. www.sub.example.com
    top_domain: str  # e.g. example.com
    subdomain: str
    tld: str
    path: str
    port: int | None

    @property
    def domain_name(self) -> str:
        """EdgeDomain.domain — the registrable part sans subdomain."""
        return self.top_domain.split(".")[0]


def parse_url(url: str) -> ParsedUrl:
    sp = urlsplit(url)
    host = (sp.hostname or "").lower()
    labels = host.split(".") if host else []
    if len(labels) >= 3 and ".".join(labels[-2:]) in _TWO_LEVEL_TLDS:
        top = ".".join(labels[-3:])
        sub = ".".join(labels[:-3])
        tld = ".".join(labels[-2:])
    elif len(labels) >= 2:
        top = ".".join(labels[-2:])
        sub = ".".join(labels[:-2])
        tld = labels[-1]
    else:
        top = host
        sub = ""
        tld = labels[-1] if labels else ""
    # default-port normalization (EdgeUrl.java port handling)
    port = sp.port
    if (sp.scheme == "http" and port == 80) or (sp.scheme == "https" and port == 443):
        port = None
    return ParsedUrl(
        proto=sp.scheme,
        fqdn=host,
        top_domain=top,
        subdomain=sub,
        tld=tld,
        path=sp.path or "/",
        port=port,
    )
