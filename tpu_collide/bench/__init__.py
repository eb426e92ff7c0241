from tpu_collide.bench.harness import PerformanceTester, PerformanceMetrics
from tpu_collide.bench.load_generator import (LoadGenerator, LoadTestResult,
                                              FailureInjector,
                                              PerformanceAnalyzer)
from tpu_collide.bench.monitor import PerformanceMonitor
