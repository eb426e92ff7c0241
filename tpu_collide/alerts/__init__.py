from tpu_collide.alerts.extract import AlertBatch, extract_alerts, compute_priority
from tpu_collide.alerts.manager import AlertManager
