"""Per-partition checkpoint manifests (resume with lineage + metrics).

The reference checkpoints through server variables — current family + last
processed id, advanced monotonically because futures drain in submission
order (``wikipedia_crawler.py:838-864``, README:328-413); restart re-crawls
at most the un-checkpointed chunk, which is safe because every write is a
keyed upsert. Our engine keeps the same contract at wave granularity:

- a wave is only checkpointed AFTER all of its table merges committed and
  the seen-set segments for the wave are flushed (atomic rename last);
- the manifest carries the entity watermark (family_rank, seed_order of the
  last fully-processed entity), the crawl-log sequence high-water mark,
  frontier-shard lineage snapshots, and fetch/parse metrics;
- resume = read latest manifest, reload seen segments ≤ that wave, skip
  entities ≤ watermark, continue. The interrupted wave replays fully;
  merge-insert idempotence bounds the overlap (test_keyed_table_idempotent_replay).
"""

from __future__ import annotations

import json
import os


class CheckpointLog:
    def __init__(self, out_dir: str):
        self.dir = os.path.join(out_dir, "checkpoints")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, wave: int) -> str:
        return os.path.join(self.dir, f"wave-{wave:06d}.json")

    def commit_wave(self, wave: int, manifest: dict) -> None:
        tmp = self._path(wave) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._path(wave))

    def latest(self) -> dict | None:
        waves = sorted(
            f for f in os.listdir(self.dir)
            if f.startswith("wave-") and f.endswith(".json")
        )
        if not waves:
            return None
        with open(os.path.join(self.dir, waves[-1])) as f:
            return json.load(f)

    def all_manifests(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.startswith("wave-") and name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(json.load(f))
        return out
