"""Task parameters — the reference's `task_param` JSON rebuilt as a
dataclass.

The reference drives every job from a MySQL `task` row whose
`task_param` column holds JSON where every value is a single-element
array of strings (constant/Constants.java:70-79, parsed by
util/ParamUtils.java:44-50).  All filter params are optional; absent
means "no constraint" (util/ValidUtils.java:24-33,60-63,92-95).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class TaskParams:
    start_date: str | None = None          # yyyy-MM-dd, inclusive
    end_date: str | None = None            # yyyy-MM-dd, inclusive
    start_age: int | None = None
    end_age: int | None = None
    professionals: tuple[str, ...] = field(default=())
    cities: tuple[str, ...] = field(default=())
    sex: str | None = None
    keywords: tuple[str, ...] = field(default=())   # event types here
    category_ids: tuple[int, ...] = field(default=())
    target_page_flow: tuple[str, ...] = field(default=())
    extract_count: int = 1000              # UserVisitSessionAnalyzeSpark.java:1056

    @classmethod
    def from_task_json(cls, raw: str) -> "TaskParams":
        """Parse the reference's task_param wire format: every value a
        single-element JSON array of strings; list-valued params are
        comma-joined inside that one string (ParamUtils.java:44-50)."""
        obj = json.loads(raw)

        def one(key: str) -> str | None:
            v = obj.get(key)
            return v[0] if v else None

        def many(key: str) -> tuple[str, ...]:
            v = one(key)
            return tuple(v.split(",")) if v else ()

        return cls(
            start_date=one("startDate"),
            end_date=one("endDate"),
            start_age=int(one("startAge")) if one("startAge") else None,
            end_age=int(one("endAge")) if one("endAge") else None,
            professionals=many("professionals"),
            cities=many("cities"),
            sex=one("sex"),
            keywords=many("keywords"),
            category_ids=tuple(int(x) for x in many("categoryIds")),
            target_page_flow=many("targetPageFlow"),
        )
