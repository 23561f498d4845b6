"""Multi-host scaffolding: mesh construction on the virtual 8-device
CPU mesh + fan-out protocol (loopback and real ZMQ pub/sub)."""

import numpy as np
import pytest

from vllm_main_modify_tpu.parallel.multihost import (StepBroadcaster,
                                                     build_global_mesh)


def test_build_global_mesh_8dev():
    mesh = build_global_mesh(tensor_parallel_size=4)
    assert mesh.shape == {"data": 2, "model": 4}
    mesh2 = build_global_mesh(tensor_parallel_size=2,
                              data_parallel_size=4)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        build_global_mesh(tensor_parallel_size=3)


def test_broadcaster_loopback():
    b = StepBroadcaster(world_size=1)
    packed = np.arange(64, dtype=np.int32)
    b.publish(7, (16, 8, True), packed)
    step_id, statics, arr = b.receive()
    assert step_id == 7 and statics == (16, 8, True)
    np.testing.assert_array_equal(arr, packed)


def test_broadcaster_zmq_roundtrip():
    import threading

    leader = StepBroadcaster(is_leader=True, world_size=2,
                             endpoint="tcp://127.0.0.1:18555")
    worker = StepBroadcaster(is_leader=False, world_size=2,
                             connect="tcp://127.0.0.1:18555")
    got = {}

    def recv():
        got["msg"] = worker.receive()

    t = threading.Thread(target=recv)
    t.start()
    packed = np.arange(32, dtype=np.int32)
    # PUB/SUB needs the subscription to land before the send
    for _ in range(50):
        leader.publish(3, (32, 8), packed)
        t.join(timeout=0.1)
        if not t.is_alive():
            break
    assert not t.is_alive(), "subscriber never received"
    step_id, statics, arr = got["msg"]
    assert step_id == 3 and statics == (32, 8)
    np.testing.assert_array_equal(arr, packed)
    leader.close()
    worker.close()
