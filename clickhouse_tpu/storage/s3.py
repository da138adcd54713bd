"""S3-compatible object storage backend + a minimal in-process S3 server.

`S3ObjectStorage` implements the engine's IObjectStorage blob contract
(storage/disks.py) against any S3 REST endpoint — AWS, minio, or the
bundled `MiniS3Server` — with real AWS Signature Version 4 request signing
(the reference's S3 client authenticates the same way:
src/IO/S3/Client.cpp, src/Disks/ObjectStorages/S3/S3ObjectStorage.cpp).

`MiniS3Server` is a tiny single-bucket S3 server (PUT/GET/DELETE object,
ListObjectsV2) used by tests and local development the way the reference's
integration tests run minio; it VERIFIES SigV4 signatures when created
with credentials, so the client's signing is exercised end-to-end.

Durable MergeTree tables route through this exactly as through any disk:
``disks: {s3: {type: s3, endpoint: ..., bucket: ..., access_key_id: ...,
secret_access_key: ...}}`` in the server config registers an
ObjectStorageDisk over S3; parts persist as blobs, BACKUP TO Disk('s3',..)
works unchanged (storage/persist.py is storage-agnostic).
"""
from __future__ import annotations

import datetime
import hashlib
import hmac
import http.client
import http.server
import threading
import urllib.parse
from typing import Dict, List, Optional, Tuple

from ..core.errors import EngineError
from .disks import IObjectStorage

__all__ = ["S3ObjectStorage", "MiniS3Server", "sigv4_headers"]


def _sha256(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def sigv4_headers(method: str, host: str, canonical_uri: str,
                  query: str, payload: bytes, access_key: str,
                  secret_key: str, region: str = "us-east-1",
                  service: str = "s3",
                  now: Optional[datetime.datetime] = None
                  ) -> Dict[str, str]:
    """AWS Signature Version 4 headers for one request (the real
    algorithm — interoperable with any S3 implementation)."""
    t = now or datetime.datetime.now(datetime.timezone.utc)
    amz_date = t.strftime("%Y%m%dT%H%M%SZ")
    datestamp = t.strftime("%Y%m%d")
    payload_hash = _sha256(payload)
    headers = {"host": host, "x-amz-content-sha256": payload_hash,
               "x-amz-date": amz_date}
    signed = ";".join(sorted(headers))
    canonical_headers = "".join(f"{k}:{headers[k]}\n" for k in sorted(headers))
    canonical_request = "\n".join([
        method, canonical_uri, query, canonical_headers, signed,
        payload_hash])
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join([
        "AWS4-HMAC-SHA256", amz_date, scope,
        _sha256(canonical_request.encode())])
    k = _hmac(("AWS4" + secret_key).encode(), datestamp)
    k = _hmac(k, region)
    k = _hmac(k, service)
    k = _hmac(k, "aws4_request")
    sig = hmac.new(k, string_to_sign.encode(), hashlib.sha256).hexdigest()
    headers["authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}")
    return headers


def _quote_key(key: str) -> str:
    return urllib.parse.quote(key, safe="/~-._")


class S3ObjectStorage(IObjectStorage):
    """Blob namespace over one S3 bucket (put/get/delete/list)."""

    kind = "s3"

    def __init__(self, endpoint: str, bucket: str,
                 access_key_id: str = "", secret_access_key: str = "",
                 region: str = "us-east-1", prefix: str = ""):
        u = urllib.parse.urlparse(
            endpoint if "://" in endpoint else "http://" + endpoint)
        if u.scheme not in ("http", "https"):
            raise EngineError(f"unsupported S3 endpoint scheme {u.scheme}")
        self.secure = u.scheme == "https"
        self.host = u.netloc
        self.bucket = bucket.strip("/")
        self.prefix = prefix.strip("/")
        self.access_key = access_key_id
        self.secret_key = secret_access_key
        self.region = region

    def _full_key(self, key: str) -> str:
        return f"{self.prefix}/{key}" if self.prefix else key

    def _request(self, method: str, key: str = "", query: str = "",
                 body: bytes = b"") -> Tuple[int, bytes]:
        uri = f"/{self.bucket}" + (f"/{_quote_key(key)}" if key else "")
        headers = sigv4_headers(method, self.host, uri, query, body,
                                self.access_key, self.secret_key,
                                self.region)
        cls = http.client.HTTPSConnection if self.secure \
            else http.client.HTTPConnection
        conn = cls(self.host, timeout=30)
        try:
            conn.request(method, uri + ("?" + query if query else ""),
                         body=body, headers=headers)
            resp = conn.getresponse()
            return resp.status, resp.read()
        finally:
            conn.close()

    def put(self, key: str, data: bytes) -> None:
        status, body = self._request("PUT", self._full_key(key), body=data)
        if status not in (200, 201):
            raise EngineError(f"S3 PUT {key}: HTTP {status} "
                              f"{body[:200]!r}")

    def get(self, key: str) -> bytes:
        status, body = self._request("GET", self._full_key(key))
        if status == 404:
            raise EngineError(f"S3 object '{key}' not found")
        if status != 200:
            raise EngineError(f"S3 GET {key}: HTTP {status}")
        return body

    def delete(self, key: str) -> None:
        status, _ = self._request("DELETE", self._full_key(key))
        if status not in (200, 204, 404):
            raise EngineError(f"S3 DELETE {key}: HTTP {status}")

    def list_keys(self, prefix: str = "") -> List[str]:
        full = self._full_key(prefix) if prefix else self.prefix
        out: List[str] = []
        token = None
        while True:
            q = "list-type=2"
            if full:
                q += "&prefix=" + urllib.parse.quote(full, safe="")
            if token:
                q += "&continuation-token=" + urllib.parse.quote(token,
                                                                 safe="")
            status, body = self._request("GET", query="&".join(
                sorted(q.split("&"))))
            if status != 200:
                raise EngineError(f"S3 LIST: HTTP {status} {body[:200]!r}")
            import re
            keys = re.findall(rb"<Key>(.*?)</Key>", body)
            out += [urllib.parse.unquote(k.decode()) for k in keys]
            m = re.search(rb"<NextContinuationToken>(.*?)"
                          rb"</NextContinuationToken>", body)
            if not m:
                break
            token = m.group(1).decode()
        if self.prefix:
            cut = len(self.prefix) + 1
            out = [k[cut:] for k in out if k.startswith(self.prefix + "/")]
        return sorted(out)


# -- bundled S3 server (tests / local development) ---------------------------

class MiniS3Server:
    """Single-bucket S3-compatible server over HTTP: PUT/GET/DELETE object
    + ListObjectsV2.  With credentials set, every request's SigV4 signature
    is RECOMPUTED and verified — the bundled stand-in for the reference's
    minio integration environment."""

    def __init__(self, bucket: str = "test", host: str = "127.0.0.1",
                 port: int = 0, access_key_id: str = "",
                 secret_access_key: str = "", region: str = "us-east-1"):
        self.bucket = bucket
        blobs: Dict[str, bytes] = {}
        self.blobs = blobs
        lock = threading.Lock()
        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):       # noqa: N802 — silence
                pass

            def _key(self):
                path = urllib.parse.urlparse(self.path).path
                parts = path.lstrip("/").split("/", 1)
                if parts[0] != outer.bucket:
                    return None
                return urllib.parse.unquote(parts[1]) if len(parts) > 1 \
                    else ""

            def _reply(self, status: int, body: bytes = b"",
                       ctype: str = "application/xml"):
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _auth_ok(self, body: bytes) -> bool:
                if not outer.secret_key:
                    return True
                auth = self.headers.get("Authorization", "")
                amz_date = self.headers.get("x-amz-date", "")
                if not auth.startswith("AWS4-HMAC-SHA256") or not amz_date:
                    return False
                try:
                    t = datetime.datetime.strptime(
                        amz_date, "%Y%m%dT%H%M%SZ").replace(
                        tzinfo=datetime.timezone.utc)
                    u = urllib.parse.urlparse(self.path)
                    q = "&".join(sorted(
                        u.query.split("&"))) if u.query else ""
                    expect = sigv4_headers(
                        self.command, self.headers.get("Host", ""),
                        u.path, q, body, outer.access_key,
                        outer.secret_key, outer.region, now=t)
                    return hmac.compare_digest(
                        expect["authorization"], auth)
                except Exception:        # noqa: BLE001
                    return False

            def do_PUT(self):            # noqa: N802
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                if not self._auth_ok(body):
                    return self._reply(403, b"<Error>SignatureDoesNotMatch"
                                            b"</Error>")
                key = self._key()
                if key is None or not key:
                    return self._reply(400)
                with lock:
                    blobs[key] = body
                self._reply(200)

            def do_GET(self):            # noqa: N802
                if not self._auth_ok(b""):
                    return self._reply(403, b"<Error>SignatureDoesNotMatch"
                                            b"</Error>")
                key = self._key()
                if key is None:
                    return self._reply(404)
                u = urllib.parse.urlparse(self.path)
                if key == "":            # ListObjectsV2
                    qs = urllib.parse.parse_qs(u.query)
                    prefix = qs.get("prefix", [""])[0]
                    with lock:
                        keys = sorted(k for k in blobs
                                      if k.startswith(prefix))
                    items = "".join(
                        f"<Contents><Key>{urllib.parse.quote(k)}</Key>"
                        f"<Size>{len(blobs[k])}</Size></Contents>"
                        for k in keys)
                    xml = (f"<?xml version='1.0'?><ListBucketResult>"
                           f"<IsTruncated>false</IsTruncated>{items}"
                           f"</ListBucketResult>").encode()
                    return self._reply(200, xml)
                with lock:
                    body = blobs.get(key)
                if body is None:
                    return self._reply(404, b"<Error>NoSuchKey</Error>")
                self._reply(200, body, "application/octet-stream")

            def do_DELETE(self):         # noqa: N802
                if not self._auth_ok(b""):
                    return self._reply(403)
                key = self._key()
                with lock:
                    blobs.pop(key, None)
                self._reply(204)

        class Server(http.server.ThreadingHTTPServer):
            daemon_threads = True
            allow_reuse_address = True

        self.access_key = access_key_id
        self.secret_key = secret_access_key
        self.region = region
        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address

    @property
    def endpoint(self) -> str:
        return f"http://{self.host}:{self.port}"

    def start_background(self) -> "MiniS3Server":
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        return self

    def shutdown(self) -> None:
        self._server.shutdown()
        self._server.server_close()
