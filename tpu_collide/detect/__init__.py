from tpu_collide.detect.pipeline import PairRisks, detect_pairs
