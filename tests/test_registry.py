import pytest

from bdvcil_tpu.registry import Registry


def test_register_and_build():
    REG = Registry("test")

    @REG.register_module()
    class Foo:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = REG.build({"type": "Foo", "a": 1})
    assert (obj.a, obj.b) == (1, 2)
    obj = REG.build({"type": "Foo", "a": 1}, b=7)
    assert obj.b == 7


def test_duplicate_registration_raises():
    REG = Registry("test")

    @REG.register_module()
    class Foo:
        pass

    with pytest.raises(KeyError):
        REG.register_module(name="Foo", cls=int)


def test_unknown_type_raises():
    REG = Registry("test")
    with pytest.raises(KeyError):
        REG.build({"type": "Nope"})


def test_custom_name():
    REG = Registry("test")

    @REG.register_module(name="Alias")
    class Foo:
        pass

    assert "Alias" in REG
    assert isinstance(REG.build({"type": "Alias"}), Foo)
