from tpu_collide.api.scene import Scene
from tpu_collide.api.sharded_scene import ShardedScene
