/* Minimal binary-compatible Kafka Connect API declaration — see ConnectorContext.java. */
package org.apache.kafka.connect.source;

import java.util.Map;

import org.apache.kafka.connect.storage.OffsetStorageReader;

public interface SourceTaskContext {
    Map<String, String> configs();

    OffsetStorageReader offsetStorageReader();
}
