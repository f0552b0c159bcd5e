from bdvcil_tpu.utils import AverageMeter, print_mean_accuracy


def test_average_meter_weighted():
    m = AverageMeter()
    m.update(100.0, 10)
    m.update(50.0, 30)
    assert abs(m.avg - 62.5) < 1e-9
    assert m.values == [100.0, 50.0]
    assert m.count == 40


def test_print_mean_accuracy_shape():
    m0 = AverageMeter()
    m0.update(90.0, 100)
    m1 = AverageMeter()
    m1.update(80.0, 100)
    m1.update(70.0, 50)
    table = print_mean_accuracy([m0, m1], [51, 5])
    assert "0-50" in table and "51-55" in table
    assert "task 0" in table and "task 1" in table and "avg_acc" in table
    # avg over tasks: (90 + 76.666..) / 2
    assert "83.33" in table


def test_profiling_helpers(tmp_path):
    import jax.numpy as jnp

    from bdvcil_tpu.utils import profiling

    with profiling.step_timer() as t:
        _ = jnp.ones((4, 4)).sum().block_until_ready()
    assert t.elapsed > 0

    with profiling.annotate("unit-test-region"):
        _ = jnp.zeros((2, 2)) + 1

    with profiling.trace(str(tmp_path / "trace")):
        _ = jnp.ones((2, 2)) * 2
    assert any((tmp_path / "trace").rglob("*"))  # xplane dump written
