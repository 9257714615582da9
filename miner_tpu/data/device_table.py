"""NewsTable: the tokenized news corpus as device-resident arrays.

The TPU-native replacement for per-batch token packing (reference:
src/entities.py:375-452): batches carry int32 indices; the jitted step gathers
token rows from this table on device.  Under a mesh the table is either
replicated (it is small: V*N*(Lt+Ls) int32) or row-sharded on the ``table``
axis (see ``miner_tpu.parallel``) with the gather running as a collective.

``lookup`` produces exactly the model batch dict the model zoo consumes,
including the masks the reference derives host-side:
  * token masks: ids != pad_token_id (reference: src/entities.py:392-400),
  * his_mask: category != pad category (reference: src/entities.py:391).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from miner_tpu.data.news_store import NewsStore


@dataclasses.dataclass
class NewsTable:
    title: jax.Array  # (V*N, Lt) int32
    sapo: Optional[jax.Array]  # (V*N, Ls) int32 or None
    category: jax.Array  # (V*N,) int32
    pad_token_id: int
    category_pad_id: int

    @staticmethod
    def from_store(
        store: NewsStore,
        use_sapo: bool = True,
        combine_type: str = "linear",
        device_put: bool = True,
    ) -> "NewsTable":
        if combine_type == "pre-concat":
            title = store.flat_title_preconcat()
            sapo = None
        else:
            title = store.flat_title()
            sapo = store.flat_sapo() if use_sapo else None
        conv = jnp.asarray if device_put else (lambda x: x)
        return NewsTable(
            title=conv(title),
            sapo=conv(sapo) if sapo is not None else None,
            category=conv(store.flat_category()),
            pad_token_id=store.pad_token_id,
            category_pad_id=store.category_pad_id,
        )

    def _gather_field(self, table: jax.Array, idx: jax.Array):
        ids = jnp.take(table, idx, axis=0)  # (B, X, L)
        mask = (ids != self.pad_token_id).astype(jnp.int32)
        return ids, mask

    def lookup(self, cand_idx: jax.Array, his_idx: jax.Array) -> Dict[str, jax.Array]:
        """cand_idx: (B, C), his_idx: (B, H) global indices -> model batch."""
        batch: Dict[str, jax.Array] = {}
        batch["cand_title"], batch["cand_title_mask"] = self._gather_field(
            self.title, cand_idx
        )
        batch["his_title"], batch["his_title_mask"] = self._gather_field(
            self.title, his_idx
        )
        if self.sapo is not None:
            batch["cand_sapo"], batch["cand_sapo_mask"] = self._gather_field(
                self.sapo, cand_idx
            )
            batch["his_sapo"], batch["his_sapo_mask"] = self._gather_field(
                self.sapo, his_idx
            )
        batch["cand_category"] = jnp.take(self.category, cand_idx, axis=0)
        batch["his_category"] = jnp.take(self.category, his_idx, axis=0)
        batch["his_mask"] = (batch["his_category"] != self.category_pad_id).astype(
            jnp.int32
        )
        return batch

    def lookup_candidates(self, cand_idx: jax.Array) -> Dict[str, jax.Array]:
        """Candidate-only lookup (pretraining)."""
        batch: Dict[str, jax.Array] = {}
        batch["cand_title"], batch["cand_title_mask"] = self._gather_field(
            self.title, cand_idx
        )
        if self.sapo is not None:
            batch["cand_sapo"], batch["cand_sapo_mask"] = self._gather_field(
                self.sapo, cand_idx
            )
        batch["cand_category"] = jnp.take(self.category, cand_idx, axis=0)
        return batch
