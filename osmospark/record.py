"""The record algebra: the tree of partial records a chain accumulates.

Behavioral contract of the reference's Data object (reference lib/Data.js,
339 LoC; golden algebra test at reference test/internals.js:1-62):

- schemaless dict that materializes lazily (``get_object``);
- setting an existing key promotes scalar → array and appends
  (reference lib/Data.js:148-155);
- ``set`` with an undefined value is a no-op (lib/Data.js:137-139);
- array-mode records ignore keys on ``set`` and push (lib/Data.js:141-143);
- ``push`` coerces an object record to a one-element array
  (lib/Data.js:304-318);
- ``merge(child)``: push onto array parents, ``set`` at the child's index
  key, else key-wise extend (keys iterated last-first, matching the JS
  ``while (i--)`` loop) (lib/Data.js:282-302, :320-337);
- empty children are never merged (object undefined short-circuits);
- ``sort_key`` re-sorts an accumulated array by per-value sortIndex so
  out-of-order async completions surface in document order
  (lib/Data.js:239-280; "Preserve sort order for .follow() results within
  .set()", reference Changes.md:32);
- a shared ref-count stack drives completion callbacks
  (lib/Data.js:109-125).

This is plain Python — it runs inside Arrow UDFs per page batch, and its
merge/sort logic is reused by the distributed record-assembly stage.
"""

from __future__ import annotations

_UNSET = object()


class Record:
    __slots__ = ("stack", "parent", "object", "_index", "sort_index",
                 "_is_array", "sort_array")

    def __init__(self, parent: "Record | None" = None) -> None:
        self.stack = {"count": 0, "done": None}
        self.parent = parent
        self.object = _UNSET
        self._index = None
        self.sort_index = None
        self._is_array = False
        self.sort_array = None

    # -- tree ---------------------------------------------------------
    def child(self) -> "Record":
        return Record(self)

    def clone(self) -> "Record":
        clone = self.next()
        clone.object = self.copy()
        return clone

    def next(self) -> "Record":
        clone = Record(self.parent)
        clone.set_sort_index(self.get_sort_index())
        clone.set_index(self.get_index())
        if self._is_array:
            clone.is_array(True)
        clone.stack = self.stack
        clone.object = self.object
        return clone

    # -- completion ref-counting ----------------------------------------
    def done(self, cb) -> "Record":
        self.stack["done"] = cb
        return self

    def ref(self) -> "Record":
        self.stack["count"] += 1
        return self

    def unref(self) -> None:
        self.stack["count"] -= 1
        if self.stack["count"] == 0 and self.stack["done"] is not None:
            self.stack["done"]()

    # -- value access ----------------------------------------------------
    def get_object(self):
        if self.object is _UNSET:
            if self.is_array():
                self.to_array()
            else:
                self.object = {}
        return self.object

    def set_object(self, obj) -> "Record":
        self.object = obj
        return self

    def copy(self):
        obj = self.object
        if self.is_array():
            return list(obj)
        if isinstance(obj, dict):
            return dict(obj)
        return obj

    def is_array(self, val=None):
        if val is not None:
            self._is_array = val is True
            return self
        return self._is_array is True or (
            self.object is not _UNSET and isinstance(self.object, list)
        )

    def is_empty(self) -> bool:
        return self.object is _UNSET or (
            isinstance(self.object, (dict, list)) and len(self.object) == 0
        )

    # -- index / sortIndex -------------------------------------------------
    def get_index(self):
        return self._index

    def set_index(self, index) -> "Record":
        if self.is_array() is not True:
            self._index = index
        return self

    def set_sort_index(self, index) -> "Record":
        if index is not None:
            self.sort_index = index
        return self

    def get_sort_index(self):
        return self.sort_index

    # -- mutation ----------------------------------------------------------
    def set(self, key, val) -> "Record":
        if val is None or val is _UNSET:
            # undefined values are ignored (lib/Data.js:137-139). Python has
            # no undefined/null split; the engine uses None for "absent".
            return self
        if self.is_array() is True:
            return self.push(val)
        obj = self.get_object()
        current = obj.get(key, _UNSET)
        if current is _UNSET:
            obj[key] = val
        elif isinstance(current, list):
            current.append(val)
        else:
            obj[key] = [current, val]
        return self

    def push(self, val) -> "Record":
        arr = self.to_array()
        if val is None or val is _UNSET:
            return self
        arr.append(val)
        return self

    def to_array(self):
        if isinstance(self.object, list):
            return self.object
        if self.is_empty():
            self.set_object([])
        else:
            self.set_object([self.object])
        return self.object

    def extend(self, obj: dict):
        # keys iterated last-first (JS `while (i--)`, lib/Data.js:325-335)
        for key in reversed(list(obj.keys())):
            if self.is_array():
                self.push(obj[key])
            else:
                self.set(key, obj[key])
        return obj

    # -- merge-up -------------------------------------------------------
    def merge(self, child: "Record") -> None:
        obj = child.object
        index = child.get_index()
        sort_index = child.get_sort_index()
        if obj is _UNSET:
            return
        if self.is_array() is True:
            self.push(obj)
        elif index is not None:
            self.set(index, obj)
        elif isinstance(obj, dict):
            self.extend(obj)
        if sort_index is not None:
            self.sort_key(index, sort_index)

    def sort_key(self, key, sort_index) -> None:
        """Order restoration (lib/Data.js:239-280): re-sort the array under
        ``key`` by each element's recorded sortIndex, stably."""
        obj = self.get_object()
        if not isinstance(obj, dict):
            return
        current = obj.get(key)
        if self.sort_array is None:
            self.sort_array = {}
        sort_arr = self.sort_array.get(key)
        if sort_arr is None:
            if isinstance(current, list) and len(current) > 0:
                sort_arr = [None] * len(current)
            else:
                sort_arr = [sort_index]
            self.sort_array[key] = sort_arr
        if isinstance(current, list):
            diff = len(current) - len(sort_arr)
            while diff > 0:
                diff -= 1
                sort_arr.append(sort_index + diff)
            pairs = sorted(
                ((v if v is not None else 0, i) for i, v in enumerate(sort_arr)),
                key=lambda p: p[0],
            )
            for new_i, (v, _old) in enumerate(pairs):
                sort_arr[new_i] = v
            obj[key] = [current[old] for _v, old in pairs]


def merge_value(parent_obj, key, value, is_parent_array: bool):
    """Standalone merge used by the distributed assembly stage: merge one
    already-ordered child value into a plain dict/list record, with the
    same promotion rules as Record.set/push/extend."""
    if value is None:
        return parent_obj
    if is_parent_array or isinstance(parent_obj, list):
        parent_obj.append(value)
    elif key is not None:
        current = parent_obj.get(key, _UNSET)
        if current is _UNSET:
            parent_obj[key] = value
        elif isinstance(current, list):
            current.append(value)
        else:
            parent_obj[key] = [current, value]
    elif isinstance(value, dict):
        for k in reversed(list(value.keys())):
            merge_value(parent_obj, k, value[k], False)
    return parent_obj
