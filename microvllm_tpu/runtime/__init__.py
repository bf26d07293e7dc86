from .engine import EngineMetrics, InferenceEngine, StepStats
from .kv_cache import CacheStats, OutOfPagesError, PageAllocator, TRASH_PAGE
from .scheduler import ScheduledBatch, Scheduler
from .sequence import FinishReason, SamplingParams, SeqState, Sequence
