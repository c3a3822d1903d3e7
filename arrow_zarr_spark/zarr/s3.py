"""Native S3 object-store backend — stdlib only.

The reference's primary deployment target is S3 (``config.rs:126-132``
builds an ``object_store`` S3 client; ``s3_bench.rs`` benches against
it). fsspec/s3fs have been absent from this environment every round,
so until now ``s3://`` stores were gated behind an import-try. S3's
REST surface needs nothing beyond the stdlib, though: SigV4 request
signing is hmac+sha256 (`hashlib`/`hmac`), transport is
`urllib.request`, listing is ListObjectsV2 XML (`xml.etree`). This
module implements the full :class:`~.store.Store` contract natively:

- GET / ranged GET (partial shard reads stay an I/O saving) / HEAD;
- PUT / DELETE for the writer stack;
- ``set_exclusive`` via the conditional put ``If-None-Match: *`` —
  S3 returns 412 PreconditionFailed when the key exists, which makes
  the version-manifest publish a REAL compare-and-swap on S3 (the
  base class's check-then-set window closes, exactly the upgrade the
  Store ABC docstring promises for this backend);
- ``touch`` / ``move`` as server-side copies (``x-amz-copy-source``,
  metadata REPLACE) — no object bytes through the client;
- incremental paginated listings (ListObjectsV2 continuation tokens;
  ``walk_prefix`` lists with ``prefix=``, ``list_root`` with
  ``delimiter=/`` — the bounded-tier probe costs one page, never the
  full key list, per the Store laziness contract);
- ``mtime`` from Last-Modified (vacuum's GC grace window works).

Addressing: ``s3://bucket/prefix`` uses virtual-host style against
``https://{bucket}.s3.{region}.amazonaws.com`` (region from
``AWS_REGION`` / ``AWS_DEFAULT_REGION``, default us-east-1) or the
endpoint in ``AWS_ENDPOINT_URL_S3`` / ``AWS_ENDPOINT_URL`` if set
(path-style, the MinIO/emulator convention). The explicit forms
``s3+http://host:port/bucket/prefix`` and ``s3+https://...`` pin the
endpoint in the URL itself — executors rebuild the store from the
URL string alone, so a custom endpoint must travel inside it.

Credentials: standard ``AWS_ACCESS_KEY_ID`` / ``AWS_SECRET_ACCESS_KEY``
(+ optional ``AWS_SESSION_TOKEN``) from the environment at store
construction; with no credentials present requests go unsigned
(public buckets). Signing is verified end-to-end in
tests/test_s3_store.py against an emulator that RE-DERIVES the
signature from the raw request with its own independent SigV4
implementation and rejects mismatches.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import os
import urllib.error
import urllib.parse
import urllib.request
from typing import Iterator, Optional, Tuple

from .meta import ZarrFormatError
from .store import Store

__all__ = ["S3Store", "sign_v4"]

_EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


def _uri_encode(s: str, *, encode_slash: bool) -> str:
    """AWS SigV4 URI encoding: RFC 3986 unreserved chars stay, space
    is %20 (never '+'), '/' only escapes in query strings."""
    safe = "-._~" + ("" if encode_slash else "/")
    return urllib.parse.quote(s, safe=safe)


def sign_v4(
    method: str,
    host: str,
    path: str,
    query: dict,
    headers: dict,
    payload_hash: str,
    region: str,
    access_key: str,
    secret_key: str,
    session_token: Optional[str] = None,
    amzdate: Optional[str] = None,
) -> dict:
    """Return the headers (x-amz-date, x-amz-content-sha256, optional
    token, Authorization) that sign this request — the AWS Signature
    Version 4 derivation, written from the published algorithm.
    ``path`` must be the already-encoded canonical URI (leading '/').
    ``amzdate`` is injectable for tests."""
    if amzdate is None:
        amzdate = _dt.datetime.now(_dt.timezone.utc).strftime(
            "%Y%m%dT%H%M%SZ"
        )
    datestamp = amzdate[:8]
    out = dict(headers)
    out["x-amz-date"] = amzdate
    out["x-amz-content-sha256"] = payload_hash
    if session_token:
        out["x-amz-security-token"] = session_token

    canonical_query = "&".join(
        f"{_uri_encode(k, encode_slash=True)}="
        f"{_uri_encode(str(v), encode_slash=True)}"
        for k, v in sorted(query.items())
    )
    sign_hdrs = {"host": host}
    for k, v in out.items():
        if k.lower().startswith("x-amz-"):
            sign_hdrs[k.lower()] = str(v).strip()
    signed_names = ";".join(sorted(sign_hdrs))
    canonical_headers = "".join(
        f"{k}:{sign_hdrs[k]}\n" for k in sorted(sign_hdrs)
    )
    canonical_request = "\n".join(
        [
            method,
            path,
            canonical_query,
            canonical_headers,
            signed_names,
            payload_hash,
        ]
    )
    scope = f"{datestamp}/{region}/s3/aws4_request"
    string_to_sign = "\n".join(
        [
            "AWS4-HMAC-SHA256",
            amzdate,
            scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ]
    )

    def _h(key: bytes, msg: str) -> bytes:
        return hmac.new(key, msg.encode(), hashlib.sha256).digest()

    k = _h(("AWS4" + secret_key).encode(), datestamp)
    k = _h(k, region)
    k = _h(k, "s3")
    k = _h(k, "aws4_request")
    signature = hmac.new(
        k, string_to_sign.encode(), hashlib.sha256
    ).hexdigest()
    out["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_names}, Signature={signature}"
    )
    return out


class S3Store(Store):
    """S3 (or S3-compatible) store over a bucket/prefix. See the
    module docstring for addressing, credentials, and capabilities."""

    def __init__(
        self,
        url: str,
        timeout: float = 60.0,
        retries: int = 4,
        backoff: float = 0.2,
    ):
        parsed = urllib.parse.urlparse(url)
        scheme = parsed.scheme
        self.timeout = timeout
        # throttling is a FACT of 100-TB request rates: S3 sheds load
        # with 503 SlowDown (and the odd 500) and documents
        # exponential backoff as the client's contract — a scan
        # without it dies mid-job exactly when the cluster is big
        # enough to matter. Bounded doubling delays, re-signed on
        # every attempt (x-amz-date must stay fresh).
        self.retries = max(0, int(retries))
        self.backoff = backoff
        self.region = (
            os.environ.get("AWS_REGION")
            or os.environ.get("AWS_DEFAULT_REGION")
            or "us-east-1"
        )
        self.access_key = os.environ.get("AWS_ACCESS_KEY_ID")
        self.secret_key = os.environ.get("AWS_SECRET_ACCESS_KEY")
        self.session_token = os.environ.get("AWS_SESSION_TOKEN")
        if scheme in ("s3+http", "s3+https"):
            # endpoint pinned in the URL (MinIO/emulator style):
            # s3+http://host:port/bucket/prefix — path-style requests
            self.endpoint = (
                f"{scheme[3:]}://{parsed.netloc}"
            )
            bucket, _, prefix = parsed.path.lstrip("/").partition("/")
        elif scheme == "s3":
            bucket = parsed.netloc
            prefix = parsed.path.lstrip("/")
            env_ep = os.environ.get(
                "AWS_ENDPOINT_URL_S3"
            ) or os.environ.get("AWS_ENDPOINT_URL")
            if env_ep:
                self.endpoint = env_ep.rstrip("/")
            else:
                self.endpoint = (
                    f"https://{bucket}.s3.{self.region}.amazonaws.com"
                )
                bucket = ""  # virtual-host style: bucket is in the host
        else:  # pragma: no cover - open_store guards the schemes
            raise ZarrFormatError(f"S3Store: unsupported scheme {scheme!r}")
        if not bucket and scheme != "s3":
            raise ZarrFormatError(
                f"S3Store: no bucket in {url!r} (want "
                "s3+http://host:port/bucket/prefix)"
            )
        self.bucket = bucket  # "" => virtual-host style
        self.prefix = prefix.strip("/")
        ep = urllib.parse.urlparse(self.endpoint)
        self.host = ep.netloc

    # -- request plumbing ------------------------------------------------

    def _object_path(self, key: str) -> str:
        parts = [p for p in (self.bucket, self.prefix) if p] + [key]
        return "/" + "/".join(
            _uri_encode(p, encode_slash=False) for p in parts
        )

    #: response codes worth retrying: S3's load-shedding (503
    #: SlowDown) and transient internal errors. 4xx (incl. 404/412,
    #: which carry semantics) never retry.
    _RETRY_CODES = (500, 502, 503, 504)

    def _request(
        self,
        method: str,
        path: str,
        query: dict,
        headers: dict,
        body: Optional[bytes],
    ):
        attempt = 0
        while True:
            try:
                return self._attempt(method, path, query, headers, body)
            except urllib.error.HTTPError as e:
                if (
                    e.code not in self._RETRY_CODES
                    or attempt >= self.retries
                ):
                    raise
            except urllib.error.URLError:
                # connection resets / refused: same backoff ladder,
                # but a host that never answers still fails fast at
                # the retry bound
                if attempt >= self.retries:
                    raise
            import time as _time

            _time.sleep(min(self.backoff * (2 ** attempt), 5.0))
            attempt += 1

    def _attempt(
        self,
        method: str,
        path: str,
        query: dict,
        headers: dict,
        body: Optional[bytes],
    ):
        payload = body or b""
        payload_hash = (
            hashlib.sha256(payload).hexdigest() if payload else _EMPTY_SHA256
        )
        hdrs = dict(headers)
        if self.access_key and self.secret_key:
            # signed per attempt: x-amz-date must be fresh on retries
            hdrs = sign_v4(
                method,
                self.host,
                path,
                query,
                hdrs,
                payload_hash,
                self.region,
                self.access_key,
                self.secret_key,
                self.session_token,
            )
        # query encoding MUST match the signed canonical form byte
        # for byte (continuation tokens carry '=' and '+')
        qs = "&".join(
            f"{_uri_encode(k, encode_slash=True)}="
            f"{_uri_encode(str(v), encode_slash=True)}"
            for k, v in sorted(query.items())
        )
        url = f"{self.endpoint}{path}" + (f"?{qs}" if qs else "")
        req = urllib.request.Request(
            url, data=body if body is not None else None, method=method
        )
        for k, v in hdrs.items():
            req.add_header(k, v)
        return urllib.request.urlopen(req, timeout=self.timeout)

    def _object(
        self,
        method: str,
        key: str,
        headers: Optional[dict] = None,
        body: Optional[bytes] = None,
        ok_missing: bool = True,
    ):
        """One object-level request; returns the response or None on
        404 (missing-key semantics). Auth/permission errors RAISE —
        treating 403 as missing would materialize fill values for the
        whole store (the HttpStore rule)."""
        try:
            return self._request(
                method, self._object_path(key), {}, headers or {}, body
            )
        except urllib.error.HTTPError as e:
            if e.code == 404 and ok_missing:
                return None
            raise ZarrFormatError(
                f"S3 {e.code} on {method} {self.endpoint}"
                f"{self._object_path(key)}"
            ) from e
        except urllib.error.URLError as e:
            raise ZarrFormatError(
                f"Cannot reach {self.endpoint}: {e.reason}"
            ) from e

    # -- Store contract --------------------------------------------------

    def get(self, key: str) -> Optional[bytes]:
        r = self._object("GET", key)
        return r.read() if r is not None else None

    def get_range(self, key: str, offset: int, length: int) -> Optional[bytes]:
        if length <= 0:
            return b""
        r = self._object(
            "GET",
            key,
            headers={"Range": f"bytes={offset}-{offset + length - 1}"},
        )
        if r is None:
            return None
        body = r.read()
        # 200 = server ignored Range (some S3 clones): slice locally
        return body if r.status == 206 else body[offset : offset + length]

    def get_suffix(self, key: str, length: int) -> Optional[bytes]:
        if length <= 0:
            return b""
        r = self._object(
            "GET", key, headers={"Range": f"bytes=-{length}"}
        )
        if r is None:
            return None
        body = r.read()
        if r.status == 206:
            return body
        return body[-length:] if length < len(body) else body

    def exists(self, key: str) -> bool:
        return self._object("HEAD", key) is not None

    def mtime(self, key: str) -> Optional[float]:
        r = self._object("HEAD", key)
        if r is None:
            return None
        lm = r.headers.get("Last-Modified")
        if not lm:
            return None
        try:
            from email.utils import parsedate_to_datetime

            return parsedate_to_datetime(lm).timestamp()
        except (TypeError, ValueError):
            return None

    def set(self, key: str, value: bytes) -> None:
        self._object("PUT", key, body=value, ok_missing=False)

    def set_exclusive(self, key: str, value: bytes) -> None:
        """Conditional put: ``If-None-Match: *`` makes S3 reject the
        write with 412 when the key exists — a true atomic publish,
        the primitive commit_version's CAS rides. Known retry edge
        (every S3 conditional-put client shares it): if the FIRST
        attempt lands but its response is lost, the retry sees 412
        and reports FileExistsError for a write we actually won —
        safe-side (a publisher may believe it lost; nobody believes
        a win that didn't happen), and the commit protocol's retry
        recomputes an idempotent manifest anyway."""
        try:
            self._request(
                "PUT",
                self._object_path(key),
                {},
                {"If-None-Match": "*"},
                value,
            )
        except urllib.error.HTTPError as e:
            if e.code in (412, 409):  # 409: concurrent conditional writes
                raise FileExistsError(key) from e
            raise ZarrFormatError(
                f"S3 {e.code} on conditional PUT {key!r}"
            ) from e
        except urllib.error.URLError as e:
            raise ZarrFormatError(
                f"Cannot reach {self.endpoint}: {e.reason}"
            ) from e

    def delete(self, key: str) -> None:
        r = self._object("DELETE", key)
        if r is not None:
            r.read()

    def _copy_source(self, key: str) -> str:
        parts = [p for p in (self.bucket, self.prefix) if p] + [key]
        if not self.bucket:
            # virtual-host style: source bucket name comes from host
            bucket = self.host.split(".s3.", 1)[0]
            parts = [bucket] + parts
        return "/" + "/".join(
            _uri_encode(p, encode_slash=False) for p in parts
        )

    def touch(self, key: str) -> None:
        """Server-side self-copy with metadata REPLACE — S3's mtime
        freshen (required because mtime() reports real ages: see the
        Store ABC's vacuum-grace contract)."""
        self._object(
            "PUT",
            key,
            headers={
                "x-amz-copy-source": self._copy_source(key),
                "x-amz-metadata-directive": "REPLACE",
            },
            ok_missing=False,
        )

    def move(self, src: str, dst: str) -> None:
        """Server-side copy + delete — object bytes never transit the
        client (the rename path distributed maintenance uses)."""
        if self._object(
            "PUT",
            dst,
            headers={"x-amz-copy-source": self._copy_source(src)},
        ) is None:
            raise ZarrFormatError(f"move: missing source key {src!r}")
        self.delete(src)

    # -- listings --------------------------------------------------------

    def _list(
        self, prefix: str, delimiter: Optional[str] = None
    ) -> Iterator[Tuple[str, bool]]:
        """ListObjectsV2, paginated, yielding (relative key, is_prefix)
        INCREMENTALLY per page — the probe_keys laziness contract."""
        import xml.etree.ElementTree as ET

        base = self.prefix
        if base and prefix:
            full_prefix = f"{base}/{prefix}"
        elif base:
            # '' means "everything under the store root": the trailing
            # slash keeps sibling roots ("storeX") out of the listing
            full_prefix = base + "/"
        else:
            full_prefix = prefix
        path = (
            "/" + _uri_encode(self.bucket, encode_slash=False)
            if self.bucket
            else "/"
        )
        token = None
        while True:
            query = {"list-type": "2"}
            if full_prefix:
                query["prefix"] = full_prefix
            if delimiter:
                query["delimiter"] = delimiter
            if token:
                query["continuation-token"] = token
            try:
                r = self._request("GET", path, query, {}, None)
                doc = r.read()
            except urllib.error.HTTPError as e:
                raise ZarrFormatError(
                    f"S3 {e.code} listing {self.endpoint}{path} "
                    f"prefix={full_prefix!r}"
                ) from e
            except urllib.error.URLError as e:
                raise ZarrFormatError(
                    f"Cannot reach {self.endpoint}: {e.reason}"
                ) from e
            root = ET.fromstring(doc)
            ns = ""
            if root.tag.startswith("{"):
                ns = root.tag[: root.tag.index("}") + 1]
            strip = len(base) + 1 if base else 0
            for c in root.findall(f"{ns}Contents"):
                k = c.findtext(f"{ns}Key") or ""
                if strip and not k.startswith(base + "/"):
                    continue
                yield k[strip:], False
            for p in root.findall(f"{ns}CommonPrefixes"):
                k = p.findtext(f"{ns}Prefix") or ""
                yield k[strip:], True
            token = root.findtext(f"{ns}NextContinuationToken")
            truncated = root.findtext(f"{ns}IsTruncated")
            if not token or truncated == "false":
                return

    def walk_keys(self) -> Iterator[str]:
        for k, is_pre in self._list(""):
            if not is_pre:
                yield k

    def walk_prefix(self, prefix: str) -> Iterator[str]:
        p = prefix if prefix.endswith("/") else prefix + "/"
        for k, is_pre in self._list(p):
            if not is_pre:
                yield k

    def list_root(self):
        out = []
        for k, is_pre in self._list("", delimiter="/"):
            if is_pre:
                out.append((k.rstrip("/"), True))
            elif k:
                out.append((k, False))
        return sorted(out)
