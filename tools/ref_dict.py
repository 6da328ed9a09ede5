"""Parser for the reference's shipped suggestion-dictionary snapshot.

``/root/reference/data/dictIndex.dat`` is a cereal BinaryOutputArchive
of ``(dict_, index_)`` (`include/Dictionary/Dictionary.hpp:225-237`)
where::

    dict_  : std::vector<std::pair<std::string, int>>   (term, count)
    index_ : std::map<int, std::set<int>>               codepoint ->
                                                        dict_ positions

Cereal's binary layout (public format, cereal docs): containers are a
little-endian uint64 size tag followed by elements; std::string is a
uint64 length + raw bytes; int is 4 bytes LE.  This parser is written
from that public spec — no reference code is used.
"""

from __future__ import annotations

import struct


def parse_dict_index(path: str):
    with open(path, "rb") as f:
        data = f.read()
    off = 0

    def u64() -> int:
        nonlocal off
        v = struct.unpack_from("<Q", data, off)[0]
        off += 8
        return v

    def i32() -> int:
        nonlocal off
        v = struct.unpack_from("<i", data, off)[0]
        off += 4
        return v

    n = u64()
    dict_: list[tuple[str, int]] = []
    for _ in range(n):
        slen = u64()
        s = data[off:off + slen].decode("utf-8")
        off += slen
        dict_.append((s, i32()))
    m = u64()
    index_: dict[int, list[int]] = {}
    for _ in range(m):
        key = i32()
        cnt = u64()
        index_[key] = [i32() for _ in range(cnt)]
    if off != len(data):
        raise ValueError(f"trailing bytes: consumed {off} of {len(data)}")
    return dict_, index_


if __name__ == "__main__":
    d, ix = parse_dict_index("/root/reference/data/dictIndex.dat")
    print(f"dict entries: {len(d)}, index chars: {len(ix)}")
    print("first entries:", d[:5])
    print("sample index:", list(ix.items())[:2])
