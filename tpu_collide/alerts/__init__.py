from tpu_collide.alerts.extract import AlertBatch, extract_alerts, compute_priority
