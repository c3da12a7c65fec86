"""Proxy configuration + rotation, Spark-first.

Reference surface: ``proxy_strategy.py:10-117`` (ProxyConfig with
from_string ``ip:port[:username:password]`` / from_dict / from_env) and
``proxy_strategy.py:135-158`` (RoundRobinProxyStrategy — an
``itertools.cycle`` advanced once per request at
``async_webcrawler.py:297-307``).

A single-process cycle is meaningless on a cluster: request order is
nondeterministic across tasks, a retried task would advance a shared
counter twice, and any shared counter is a coordination point. The
Spark-native equivalent of "rotate evenly across the pool" is a
DETERMINISTIC modular assignment computed as a column:

    proxy_i = pmod(xxhash64(key), n_proxies)

which (a) spreads load evenly across proxies for any reasonable URL
population, (b) is reproducible — a crash-resumed or speculatively
re-executed task assigns the same proxy to the same URL, preserving
the engine's bit-identical-replay contract, and (c) costs one JVM
expression, no shuffle, no state. ``per="url"`` rotates per request
(the reference's behavior in spirit); ``per="host"`` pins each host to
one sticky proxy (stable egress IP per site — what rotation users
usually actually want).

Wiring: ``assign_proxies`` adds a ``proxy_server`` column;
``UrllibFetcher`` (operators/fetch.py) routes any row carrying one
through that proxy (urllib ProxyHandler; credentials ride in the URL
userinfo and become Proxy-Authorization). ``CrawlConfig(proxies=[...])``
does both ends inside the crawl loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ProxyConfig:
    """One proxy endpoint (reference: proxy_strategy.py:10-117).

    ``server`` is a URL like ``http://127.0.0.1:8080``; ``username`` /
    ``password`` are optional basic-auth credentials; ``ip`` (for
    verification flows) defaults to the host part of ``server``.
    """

    def __init__(
        self,
        server: str,
        username: str | None = None,
        password: str | None = None,
        ip: str | None = None,
    ):
        self.server = server
        self.username = username
        self.password = password
        self.ip = ip or self._extract_ip()

    def _extract_ip(self) -> str | None:
        try:
            rest = self.server.split("://", 1)[-1]
            host = rest.split("@")[-1].split(":")[0].split("/")[0]
            return host or None
        except Exception:
            return None

    @staticmethod
    def from_string(proxy_str: str) -> "ProxyConfig":
        """``ip:port:username:password`` or ``ip:port``
        (reference: proxy_strategy.py:46-65)."""
        parts = proxy_str.split(":")
        if len(parts) == 4:
            ip, port, username, password = parts
            return ProxyConfig(
                server=f"http://{ip}:{port}",
                username=username,
                password=password,
                ip=ip,
            )
        if len(parts) == 2:
            ip, port = parts
            return ProxyConfig(server=f"http://{ip}:{port}", ip=ip)
        raise ValueError(f"Invalid proxy string format: {proxy_str}")

    @staticmethod
    def from_dict(d: dict) -> "ProxyConfig":
        return ProxyConfig(
            server=d.get("server"),
            username=d.get("username"),
            password=d.get("password"),
            ip=d.get("ip"),
        )

    @staticmethod
    def from_env(env_var: str = "PROXIES") -> list["ProxyConfig"]:
        """Comma-separated proxy strings from the environment
        (reference: proxy_strategy.py:77-96). Malformed entries are
        skipped (the reference swallows them too, with a print)."""
        out = []
        for s in os.getenv(env_var, "").split(","):
            if not s:
                continue
            try:
                out.append(ProxyConfig.from_string(s))
            except ValueError:
                continue
        return out

    def to_dict(self) -> dict:
        return {
            "server": self.server,
            "username": self.username,
            "password": self.password,
            "ip": self.ip,
        }

    def clone(self, **kwargs) -> "ProxyConfig":
        d = self.to_dict()
        d.update(kwargs)
        return ProxyConfig.from_dict(d)

    def request_url(self) -> str:
        """The server URL with credentials embedded in the userinfo —
        the form urllib's ProxyHandler consumes (it emits
        Proxy-Authorization from it)."""
        if not self.username:
            return self.server
        from urllib.parse import quote

        scheme, sep, rest = self.server.partition("://")
        if not sep:
            scheme, rest = "http", self.server
        cred = quote(self.username, safe="")
        if self.password is not None:
            cred += ":" + quote(self.password, safe="")
        return f"{scheme}://{cred}@{rest}"


def _coerce(p) -> ProxyConfig:
    if isinstance(p, ProxyConfig):
        return p
    if isinstance(p, dict):
        return ProxyConfig.from_dict(p)
    if isinstance(p, str):
        # a full URL is already a server spec; ip:port[:user:pass]
        # goes through the reference's string format
        if "://" in p:
            return ProxyConfig(server=p)
        return ProxyConfig.from_string(p)
    raise TypeError(f"not a proxy spec: {p!r}")


def assign_proxies(
    df: DataFrame,
    proxies,
    url_col: str = "url",
    per: str = "url",
    out_col: str = "proxy_server",
) -> DataFrame:
    """Add a deterministic proxy assignment column.

    ``per="url"``: rotate per request — pmod(xxhash64(url), n), the
    distributed stand-in for the reference's per-request cycle
    (async_webcrawler.py:297-307). ``per="host"``: one sticky proxy
    per host — pmod(xxhash64(host-of-url), n).

    The column value is the credentialed request URL
    (:meth:`ProxyConfig.request_url`), ready for the fetcher. NB it
    therefore may carry credentials — treat the fetch-layout frame
    accordingly (the crawl loop drops it before results are written).
    """
    pool = [_coerce(p) for p in proxies]
    if not pool:
        return df.withColumn(out_col, F.lit(None).cast("string"))
    if per == "host":
        from ..functions.urls import host as host_of

        key = host_of(F.col(url_col))
    elif per == "url":
        key = F.col(url_col)
    else:
        raise ValueError(f"per must be 'url' or 'host', got {per!r}")
    arr = F.array(*[F.lit(p.request_url()) for p in pool])
    return df.withColumn(
        out_col,
        F.element_at(arr, (F.pmod(F.xxhash64(key), F.lit(len(pool))) + 1).cast("int")),
    )
