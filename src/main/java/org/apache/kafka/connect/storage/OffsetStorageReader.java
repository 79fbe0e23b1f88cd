/* Minimal binary-compatible Kafka Connect API declaration — see ConnectorContext.java. */
package org.apache.kafka.connect.storage;

import java.util.Collection;
import java.util.Map;

public interface OffsetStorageReader {
    <T> Map<String, Object> offset(Map<String, T> partition);

    <T> Map<Map<String, T>, Map<String, Object>> offsets(Collection<Map<String, T>> partitions);
}
