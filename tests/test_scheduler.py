"""Scheduler unit tests — continuous batching semantics."""

from microvllm_tpu.config import SchedulerConfig
from microvllm_tpu.runtime.scheduler import Scheduler
from microvllm_tpu.runtime.sequence import SamplingParams, SeqState, Sequence


def make_sched(**kw):
    cfg = SchedulerConfig(
        max_batch_size=8,
        max_prefill_tokens=512,
        prefill_wait_s=0.0,
        decode_buckets=(1, 2, 4, 8),
        prefill_len_buckets=(16, 32, 64),
        prefill_batch_buckets=(1, 2, 4),
        **kw,
    )
    return Scheduler(cfg, max_model_len=128)


def seq(n_prompt=10, **kw):
    return Sequence(prompt_token_ids=list(range(n_prompt)),
                    sampling=SamplingParams(**kw))


def test_prefill_before_decode():
    s = make_sched()
    s.add_request(seq())
    b = s.get_next_batch()
    assert b.kind == "prefill"
    assert b.chunk_len == 16          # 10 tokens -> 16 bucket
    assert b.batch_size == 1
    assert b.sample_mask == [True]


def test_prefill_length_bucketing_groups_same_bucket():
    s = make_sched()
    for n in (10, 12, 40, 11):
        s.add_request(seq(n))
    b = s.get_next_batch()
    # three seqs fall in the 16 bucket; the 40-token one (bucket 64) waits
    assert b.kind == "prefill"
    assert len(b.seqs) == 3
    assert b.chunk_len == 16
    assert b.batch_size == 4          # padded to batch bucket


def test_decode_after_prefill_complete():
    s = make_sched()
    s.add_request(seq())
    b = s.get_next_batch()
    s.on_prefill_done(b)
    assert b.seqs[0].state == SeqState.RUNNING
    b2 = s.get_next_batch()
    assert b2.kind == "decode"
    assert b2.batch_size == 1


def test_decode_batch_padded_to_bucket():
    s = make_sched()
    for _ in range(3):
        s.add_request(seq())
    while True:
        b = s.get_next_batch()
        if b is None or b.kind != "prefill":
            break
        s.on_prefill_done(b)
    assert b.kind == "decode"
    assert len(b.seqs) == 3
    assert b.batch_size == 4


def test_chunked_prefill_long_prompt():
    s = make_sched()
    s.add_request(seq(100))           # > largest bucket 64 -> 2 chunks
    b1 = s.get_next_batch()
    assert b1.kind == "prefill" and b1.chunk_len == 64
    assert b1.sample_mask == [False]  # not the last chunk
    s.on_prefill_done(b1)
    assert b1.seqs[0].num_prefilled == 64
    assert b1.seqs[0].state == SeqState.PREFILLING
    b2 = s.get_next_batch()
    assert b2.kind == "prefill" and b2.chunk_len == 64  # 36 left -> 64 bucket
    assert b2.sample_mask == [True]
    s.on_prefill_done(b2)
    assert b2.seqs[0].state == SeqState.RUNNING


def test_preempt_returns_to_waiting_head():
    s = make_sched()
    q = seq()
    s.add_request(q)
    b = s.get_next_batch()
    s.on_prefill_done(b)
    q.output_token_ids = [5, 6]
    s.preempt(q)
    assert q.state == SeqState.WAITING
    assert s.waiting[0] is q
    assert q.num_prefilled == 0
    # recompute target covers prompt + generated - 1
    assert s._prefill_target(q) == q.num_tokens - 1


def test_abort():
    s = make_sched()
    sid = seq()
    s.add_request(sid)
    assert s.abort(sid.seq_id)
    assert s.is_finished()
    assert sid.is_finished


def test_decode_rotation_no_starvation():
    """With more running sequences than the largest decode bucket, rotation
    must schedule every sequence within a bounded number of batches (r1 took
    running[:cap], starving the tail)."""
    s = make_sched()
    seqs = [seq() for _ in range(12)]     # cap = 8
    for q in seqs:
        q.state = SeqState.RUNNING
        s.running.append(q)
    served = set()
    for _ in range(3):                    # ceil(12/8) = 2 batches suffice
        b = s._form_decode_batch()
        assert len(b.seqs) <= 8
        served.update(q.seq_id for q in b.seqs)
    assert served == {q.seq_id for q in seqs}


def test_decode_priority_always_included():
    s = make_sched()
    lo = [seq() for _ in range(10)]
    hi = Sequence(prompt_token_ids=list(range(5)), priority=5)
    for q in lo + [hi]:
        q.state = SeqState.RUNNING
        s.running.append(q)
    for _ in range(4):
        b = s._form_decode_batch()
        assert hi in b.seqs               # high priority never rotated out
    # and the low-priority pool still rotates fully
    served = set()
    for _ in range(3):
        served.update(q.seq_id for q in s._form_decode_batch().seqs)
    assert served == {q.seq_id for q in lo + [hi]}


def test_mark_finished_removes_from_running():
    s = make_sched()
    q = seq()
    s.add_request(q)
    b = s.get_next_batch()
    s.on_prefill_done(b)
    s.mark_finished(q)
    assert s.get_next_batch() is None
    assert s.pop_finished() == [q]
