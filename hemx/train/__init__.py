from hemx.train.optimizers import init_optimizer
from hemx.train.checkpoint import CheckpointManager
from hemx.train.loop import train, inference
