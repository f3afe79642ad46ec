"""HttpWiki retry/maxlag routing vs a LOCAL stub HTTP server (VERDICT r3
item 8 — the Fetcher seam). No live network: the stub binds 127.0.0.1 and
scripts the MediaWiki responses (maxlag envelopes, API errors, 5xx).
Injected sleep_fn records backoffs instead of sleeping, so the reference
backoff schedule (5, 10, 20, 40... capped 60; Retry-After override) is
asserted exactly."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from wikicrawl.families import WBGETENTITIES_MAX_RETRIES
from wikicrawl.fetcher import Fetcher, HttpWiki, _backoff_seconds


class _StubState:
    def __init__(self):
        self.script = {}  # action -> list of response dicts (consumed)
        self.hits = []  # (action, params) log

    def next_response(self, action):
        seq = self.script.get(action) or []
        return seq.pop(0) if seq else {"status": 200, "body": {}}


def _make_handler(state: _StubState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def do_GET(self):
            q = {k: v[0] for k, v in
                 parse_qs(urlparse(self.path).query).items()}
            action = q.get("action", "?")
            state.hits.append((action, q))
            r = state.next_response(action)
            self.send_response(r.get("status", 200))
            for k, v in (r.get("headers") or {}).items():
                self.send_header(k, v)
            body = json.dumps(r.get("body", {})).encode()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


@pytest.fixture()
def stub():
    state = _StubState()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/w/api.php"
    yield state, url
    srv.shutdown()
    srv.server_close()


def make_wiki(url, sleeps):
    return HttpWiki(wikidata_api=url, site_api=lambda lang: url,
                    sleep_fn=sleeps.append)


MAXLAG = {"status": 200,
          "body": {"error": {"code": "maxlag", "lag": 2.1}}}


def sitelinks_ok(qid):
    return {"status": 200, "body": {"entities": {qid: {"sitelinks": {
        "enwiki": {"site": "enwiki", "title": "Tour Eiffel"},
        "frwiki": {"site": "frwiki", "title": "Tour Eiffel (fr)"},
        "commonswiki": {"site": "commonswiki", "title": "ignored"},
    }}}}}


def test_virtualwiki_satisfies_fetcher_protocol():
    from wikicrawl.vwiki import VirtualWiki

    for name in ("resolve_sitelinks", "parse", "summary_main_image",
                 "media_items", "robots_allowed"):
        assert callable(getattr(VirtualWiki, name))
    assert issubclass(HttpWiki, object) and isinstance(
        HttpWiki.__init__, object)
    # runtime_checkable structural check on an instance-like dummy
    class _Dummy:
        resolve_sitelinks = parse = summary_main_image = None
        media_items = robots_allowed = None
    assert not isinstance(object(), Fetcher)


def test_maxlag_retries_then_success(stub):
    state, url = stub
    sleeps = []
    state.script["wbgetentities"] = [MAXLAG, MAXLAG, sitelinks_ok("Q1")]
    links, attempts = make_wiki(url, sleeps).resolve_sitelinks("Q1")
    assert links == {"en": "Tour Eiffel", "fr": "Tour Eiffel (fr)",
                     "commons": "ignored"}
    assert attempts == 1  # reference counts ONE logical request on success
    # exact reference backoff schedule: 5 * 2^(attempt-1)
    assert sleeps == [5.0, 10.0]
    assert len([h for h in state.hits if h[0] == "wbgetentities"]) == 3


def test_maxlag_honors_retry_after(stub):
    state, url = stub
    sleeps = []
    state.script["wbgetentities"] = [
        dict(MAXLAG, headers={"Retry-After": "7"}), sitelinks_ok("Q2")]
    make_wiki(url, sleeps).resolve_sitelinks("Q2")
    assert sleeps == [7.0]


def test_persistent_maxlag_routes_transient(stub):
    state, url = stub
    sleeps = []
    state.script["wbgetentities"] = [MAXLAG] * WBGETENTITIES_MAX_RETRIES
    links, attempts = make_wiki(url, sleeps).resolve_sitelinks("Q3")
    assert links is None  # TRANSIENT: retry partition, not "no sitelinks"
    assert attempts == WBGETENTITIES_MAX_RETRIES
    # 5, 10, 20, 40, 60(capped from 80)
    assert sleeps == [5.0, 10.0, 20.0, 40.0, 60.0]


def test_terminal_api_error_is_not_retried(stub):
    state, url = stub
    sleeps = []
    state.script["wbgetentities"] = [
        {"status": 200, "body": {"error": {"code": "no-such-entity"}}}]
    links, attempts = make_wiki(url, sleeps).resolve_sitelinks("Q4")
    assert links == {} and attempts == 1 and sleeps == []
    assert len(state.hits) == 1


def test_parse_maxlag_three_attempts(stub):
    state, url = stub
    sleeps = []
    ok = {"status": 200,
          "body": {"parse": {"text": {"*": "<p>bonjour</p>"}}}}
    state.script["parse"] = [MAXLAG, MAXLAG, ok]
    r = make_wiki(url, sleeps).parse("fr", "Tour Eiffel")
    assert r.success and r.html == "<p>bonjour</p>"

    state.script["parse"] = [MAXLAG, MAXLAG, MAXLAG]
    r = make_wiki(url, sleeps).parse("fr", "Tour Eiffel")
    assert not r.success and r.attempts == 3  # PARSE_MAX_RETRIES exhausted


def test_5xx_exhausts_urllib3_retry_then_non_retryable(stub):
    state, url = stub
    sleeps = []
    # urllib3 Retry (status=3, raise_on_status=False) eats the 5xx chain
    # inside ONE session.get; the reference then treats a non-200 as
    # non-retryable (returns None -> empty sitelinks, 1 logical attempt)
    state.script["wbgetentities"] = [{"status": 503, "body": {}}] * 10
    wiki = HttpWiki(wikidata_api=url, site_api=lambda lang: url,
                    sleep_fn=sleeps.append)
    wiki.session.get_adapter(url).max_retries = \
        wiki.session.get_adapter(url).max_retries.new(backoff_factor=0)
    links, attempts = wiki.resolve_sitelinks("Q5")
    assert links == {} and attempts == 1
    assert len(state.hits) == 4  # 1 try + 3 status retries, one logical GET


def test_backoff_rule_matches_reference():
    assert _backoff_seconds(1, None) == 5.0
    assert _backoff_seconds(4, None) == 40.0
    assert _backoff_seconds(5, None) == 60.0  # capped from 80
    assert _backoff_seconds(3, "2.5") == 2.5
    assert _backoff_seconds(3, "junk") == 20.0
