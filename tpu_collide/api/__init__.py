from tpu_collide.api.scene import Scene
