"""Native C++ slot-scheduler core tests (builds with g++ at import)."""

import pytest

native = pytest.importorskip("mustafar_tpu.native")


@pytest.fixture
def sched():
    if native.load_scheduler_lib() is None:
        pytest.skip("no g++ toolchain")
    return native.NativeSlotScheduler(num_slots=2, max_seq_len=128)


def test_admission_and_fill(sched):
    assert sched.submit(1, 10, 5)
    assert sched.submit(2, 20, 5)
    assert sched.submit(3, 30, 5)          # queued, no free slot yet
    admitted = sched.fill()
    assert [(s, u) for s, u, *_ in admitted] == [(0, 1), (1, 2)]
    assert sched.num_active == 2 and sched.num_queued == 1
    assert sched.positions() == [10, 20]


def test_reject_oversized(sched):
    assert not sched.submit(9, 120, 20)    # 140 > 128
    assert sched.stats()["rejected"] == 1


def test_commit_retire_and_reuse(sched):
    sched.submit(1, 10, 2)
    sched.submit(2, 10, 5)
    sched.submit(3, 10, 5)
    sched.fill()
    assert sched.commit(0, False) == 0     # 1 token left
    assert sched.commit(0, False) == 1     # budget exhausted -> retired
    assert sched.num_active == 1
    admitted = sched.fill()                # uid 3 takes slot 0
    assert admitted[0][0] == 0 and admitted[0][1] == 3
    assert sched.commit(1, True) == 1      # eos retires
    assert sched.stats()["finished"] == 2


def test_commit_errors(sched):
    assert sched.commit(0, False) == -1    # inactive slot
    assert sched.commit(7, False) == -1    # out of range
