from __future__ import annotations

import pytest

from bionext_spark import synth
from bionext_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bionext-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_rows():
    # Small but adversarial: includes a 60-turn skew conversation.
    return synth.generate_transcripts(n_conversations=20, skew_conversation_turns=60)


@pytest.fixture(scope="session")
def transcripts(spark, transcripts_rows):
    from bionext_spark.sources.fixtures import transcripts_df

    return transcripts_df(spark, transcripts_rows)
