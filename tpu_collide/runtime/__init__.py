from tpu_collide.runtime.messaging import (Message, MessageBroker,
                                           MessageProducer, MessageConsumer,
                                           LocationDataProducer, TaskProducer,
                                           TaskResultProducer)
from tpu_collide.runtime.storage import (StorageInterface, InMemoryStorage,
                                         VehicleLocationStorage,
                                         CollisionRiskStorage,
                                         GridVehicleStorage, StorageFactory)
from tpu_collide.runtime.scheduler import Scheduler, SchedulerClient, TaskWorker
from tpu_collide.runtime.reliability import (HeartbeatMonitor, LeaderElection,
                                             ReplicationManager,
                                             FailoverManager,
                                             ThrottlingManager,
                                             ThrottlingPolicy,
                                             AdaptiveThrottling,
                                             StateTransferManager,
                                             RecoveryCoordinator)
