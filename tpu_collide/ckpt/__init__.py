from tpu_collide.ckpt.checkpoint import CheckpointManager, BackupManager
