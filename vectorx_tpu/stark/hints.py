"""Hint runtime — off-circuit witness generation hooks.

Role parity with plonky2x's async hint system (`async_hint` /
`HintRegistry`, SURVEY.md §2.2 "Hint runtime"; e.g. the reference's
HeaderRangeFetcherHint and HintSimpleJustification fetch chain data during
witness generation, /root/reference/circuits/builder/
subchain_verification.rs:306-378, justification.rs:22-84).

Here a hint is an async callable registered by name; `WitnessBuilder`
resolves all hints concurrently (asyncio fan-out — the reference's <=200
concurrent fetches) and hands their numpy outputs to the trace builders.
A serializable registry maps hint names to implementations so a
build/prove split can reconstruct the pipeline (HintRegistry parity).
"""

from __future__ import annotations

import asyncio
import logging
from typing import Any, Awaitable, Callable, Dict, List

log = logging.getLogger("vectorx.hints")

Hint = Callable[..., Awaitable[Any]]


class HintRegistry:
    def __init__(self):
        self._hints: Dict[str, Hint] = {}

    def register(self, name: str, fn: Hint) -> None:
        if name in self._hints:
            raise ValueError(f"hint already registered: {name}")
        self._hints[name] = fn

    def hint(self, name: str):
        """Decorator form."""
        def wrap(fn: Hint) -> Hint:
            self.register(name, fn)
            return fn
        return wrap

    def names(self) -> List[str]:
        return sorted(self._hints)

    def get(self, name: str) -> Hint:
        return self._hints[name]


class WitnessBuilder:
    """Collects hint invocations, resolves them concurrently, then lets the
    caller assemble traces from the results."""

    def __init__(self, registry: HintRegistry, max_concurrency: int = 200):
        self.registry = registry
        self._sem = asyncio.Semaphore(max_concurrency)
        self._pending: List = []
        self._keys: List[str] = []

    def request(self, key: str, hint_name: str, *args, **kwargs) -> None:
        async def run():
            async with self._sem:
                return await self.registry.get(hint_name)(*args, **kwargs)
        self._keys.append(key)
        self._pending.append(run())

    async def resolve(self) -> Dict[str, Any]:
        results = await asyncio.gather(*self._pending)
        out = dict(zip(self._keys, results))
        self._pending, self._keys = [], []
        return out
