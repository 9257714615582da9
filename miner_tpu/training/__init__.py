from miner_tpu.training import losses, optim

__all__ = ["losses", "optim"]
