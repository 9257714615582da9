from miner_tpu.observability.logging import RunLogger

__all__ = ["RunLogger"]
