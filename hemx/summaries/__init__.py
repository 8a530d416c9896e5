from hemx.summaries.events import EventsWriter, SummaryWriterSet
from hemx.summaries.reader import get_all_events, get_tag_values
from hemx.summaries.montage import montage, factorization
